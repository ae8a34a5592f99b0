"""rand() in the vector engine: pregenerated MT19937 streams must produce
the exact golden sequence."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.semantics import mt19937np as MT
from zorak_tpu.semantics.scalar import EelRng
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin


class TestVectorizedMT:
    def test_matches_eelrng(self):
        rng = EelRng()
        ref = [rng.gen_u32() for _ in range(2000)]
        draws, _ = MT.generate(2000)
        assert [int(v) for v in draws] == ref

    def test_continuation(self):
        rng = EelRng()
        for _ in range(700):
            rng.gen_u32()
        state = MT.eelrng_state_tuple(rng)
        ref = [rng.gen_u32() for _ in range(1000)]
        draws, new_state = MT.generate(1000, state)
        assert [int(v) for v in draws] == ref
        # restore propagates the advance
        rng2 = EelRng()
        MT.restore_eelrng(rng2, new_state)
        assert rng2.gen_u32() == rng.gen_u32()


class TestRandInSample:
    def test_noise_source_null(self):
        src = "@sample\nspl0 = rand(2) - 1;\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               np.zeros((1, 3000), dtype=np.float32),
                               segment_len=1024)
        assert rep.passed, rep.summary()

    def test_multiple_draws_per_sample(self):
        src = ("@sample\n"
               "a = rand(1);\nb = rand(10);\n"
               "spl0 = a*0.1 + b*0.01 + spl0*0.5;\n")
        rep = null_test_plugin(compile_plugin_source(src),
                               (np.random.RandomState(0).randn(1, 2000) * 0.2
                                ).astype(np.float32), segment_len=512)
        assert rep.passed, rep.summary()

    def test_rand_after_init_draws(self):
        # @init consumes draws; @sample must continue the same sequence
        src = ("@init\nseed_burn = rand(1) + rand(1);\n"
               "@sample\nspl0 = rand(1);\n")
        rep = null_test_plugin(compile_plugin_source(src),
                               np.zeros((1, 1500), dtype=np.float32),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_rand_with_dynamic_limit(self):
        src = "@sample\nlim = 1 + abs(spl0)*5;\nspl0 = rand(lim) * 0.1;\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               (np.random.RandomState(1).randn(1, 2000) * 0.4
                                ).astype(np.float32), segment_len=512)
        assert rep.passed, rep.summary()

    def test_rand_in_branch(self):
        # draws consumed only when the gate holds: the vector engine
        # compacts draw indices with a fire-count prefix sum
        src = "@sample\nspl0 > 0 ? ( spl0 = rand(1) * 0.5; ) : ( spl0 *= 2; );\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               (np.random.RandomState(5).randn(1, 1500) * 0.4
                                ).astype(np.float32), segment_len=512)
        assert rep.passed, rep.summary()

    def test_rand_in_branch_streamed(self):
        # generator state must rebase between resumed renders (only the
        # consumed draws advance the stream)
        from zorak_tpu.shadow import compile_native_shadow
        from zorak_tpu.verify.nulltest import apply_slider_state

        src = "@sample\nspl0 > 0 ? ( spl0 = rand(1) * 0.5; ) : ( spl0 *= 2; );\n"
        prog = compile_plugin_source(src)
        x = (np.random.RandomState(6).randn(1, 1400) * 0.4).astype(np.float32)

        gold = compile_native_shadow(prog)
        gold.state.srate = 48000.0
        apply_slider_state(gold.state, prog, None)
        gold.run_init()
        gold.run_slider()
        y_ref = np.zeros_like(x)
        for s in range(0, 1400, 512):
            e = min(s + 512, 1400)
            gold.process_block(x[:, s:e], y_ref[:, s:e])

        shadow = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, shadow.state, 1,
                                        segment_len=512)
        y1, carry = kern.render(x[:, :700])
        y2, carry = kern.render(x[:, 700:], carry)
        y = np.concatenate([y1, y2], axis=1)
        assert np.abs(y.astype(np.float64) - y_ref).max() <= 1e-5

    def test_rng_state_parity_after_render(self):
        src = "@sample\nspl0 = rand(1);\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               np.zeros((1, 700), dtype=np.float32),
                               segment_len=256)
        assert rep.passed, rep.summary()

    def test_catalog_soma(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Dynamics/SOMA/src/SOMA.jsfx")
        x = (np.random.RandomState(2).randn(2, 4000) * 0.3).astype(np.float32)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"SOMA not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()

    def test_catalog_bedrock(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spectral/BedRock/src/BedRock.jsfx")
        x = (np.random.RandomState(3).randn(2, 4000) * 0.3).astype(np.float32)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"BedRock not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()
