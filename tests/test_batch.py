"""Batch scale-out: vmapped files axis, mesh sharding, catalog sweep."""
import numpy as np
import pytest

import jax

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.parallel import BatchRenderer, catalog_batch_render

SRC = ("@init\nMASK = 255;\n"
       "@sample\nbuf[w & MASK] = spl0;\n"
       "z = 0.99*z + 0.01*buf[(w - 100) & MASK];\n"
       "spl0 = z;\nw += 1;\n")


def files(nf, ch, n, seed=0):
    return (np.random.RandomState(seed).randn(nf, ch, n) * 0.3).astype(np.float32)


class TestBatch:
    def test_batch_matches_individual(self):
        prog = compile_plugin_source(SRC)
        x = files(3, 1, 2000)
        r = BatchRenderer(prog, segment_len=512)
        y = np.asarray(r.render_files(x))
        # each file must match a solo render
        from zorak_tpu.lowering import specialize_sample_kernel
        from zorak_tpu.verify import make_initialized_shadow
        for i in range(3):
            sh = make_initialized_shadow(prog)
            k = specialize_sample_kernel(prog, sh.state, 1, segment_len=512)
            yi, _ = k.render(x[i])
            assert np.array_equal(y[i], yi), f"file {i}"

    def test_mesh_sharded_files(self):
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = Mesh(np.array(devs[:4]), ("files",))
        prog = compile_plugin_source(SRC)
        x = files(4, 1, 1024, seed=2)
        r = BatchRenderer(prog, segment_len=256)
        y_mesh = np.asarray(r.render_files(x, mesh=mesh))
        y_solo = np.asarray(BatchRenderer(prog, segment_len=256).render_files(x))
        assert np.array_equal(y_mesh, y_solo)

    def test_ddt_batch(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        x = files(2, 2, 4096, seed=3)
        r = BatchRenderer(prog, segment_len=2048)
        y = np.asarray(r.render_files(x))
        assert y.shape == (2, 2, 4096)
        assert np.all(np.isfinite(y))
        assert not np.array_equal(y[0], y[1])

    def test_catalog_sweep(self, reference_root):
        x = (np.random.RandomState(4).randn(2, 2048) * 0.25).astype(np.float32)
        outs, skipped = catalog_batch_render(str(reference_root), x,
                                             segment_len=1024)
        assert len(outs) >= 6, (sorted(outs), skipped)
        for slug, y in outs.items():
            assert np.all(np.isfinite(np.asarray(y))), slug

    def test_faust_in_stacked_sweep(self, reference_root):
        """The Faust five ride the catalog sweep as native JAX modules
        (ref plugins: plugins/Dynamics/GTS/src/*.dsp and siblings) and
        must match a direct module render exactly."""
        import jax.numpy as jnp

        from zorak_tpu.models import get_faust_module
        from zorak_tpu.parallel import (build_catalog_renderers,
                                        catalog_stacked_render)

        x = (np.random.RandomState(5).randn(2, 3000) * 0.25).astype(np.float32)
        rend, skipped = build_catalog_renderers(str(reference_root),
                                                only="GTS")
        assert "GTS" in rend, skipped
        outs, _ = catalog_stacked_render(rend, x)
        y = np.asarray(outs["GTS"])
        mod = get_faust_module("GTS")
        yref = np.asarray(mod.render(jnp.asarray(x, jnp.float64),
                                     mod.values(), 48000.0))
        assert y.shape == yref.shape
        assert np.allclose(y, yref.astype(np.float32), atol=1e-6)
        # render_files (the unstacked path) agrees too
        yf = np.asarray(rend["GTS"].render_files(x[None]))
        assert np.allclose(yf[0], y, atol=1e-6)
