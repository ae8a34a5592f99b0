"""Staged dumps, gfx var-sync analysis, @serialize compilation."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.ir.gfxsync import FROM_GFX, TO_GFX, analyze_gfx_var_sync
from zorak_tpu.lowering import specialize_sample_kernel
from zorak_tpu.shadow import compile_shadow
from zorak_tpu.utils.dumps import dump_stages
from zorak_tpu.verify import make_initialized_shadow


class TestDumps:
    def test_stages_written(self, reference_plugins, tmp_path):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        shadow = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, shadow.state, 2, segment_len=2048)
        paths = dump_stages(kern, tmp_path, example_len=512)
        assert set(paths) >= {"01_source.jsfx", "02_sections_lowered.jsfx",
                              "03_plan.txt", "04_jaxpr.txt", "05_stablehlo.txt"}
        plan = (tmp_path / "03_plan.txt").read_text()
        assert "induction" in plan and "linrec" in plan
        assert "ring_regions=[(0, 16384), (16384, 16384)]" in plan
        assert "associative_scan" in (tmp_path / "04_jaxpr.txt").read_text() \
            or "cumlogsumexp" not in (tmp_path / "04_jaxpr.txt").read_text()
        assert "stablehlo" in (tmp_path / "05_stablehlo.txt").read_text() or \
            "module" in (tmp_path / "05_stablehlo.txt").read_text()


class TestGfxSync:
    SRC = """\
options: ownership=hybrid
@init
meter = 0; ui_gain = 1;
@sample
meter = 0.99*meter + 0.01*abs(spl0);
spl0 *= ui_gain;
@gfx
gfx_x = 0;
disp = meter;
ui_gain = 0.5 + disp;
"""

    def test_hybrid_flags(self):
        prog = compile_plugin_source(self.SRC)
        info = analyze_gfx_var_sync(prog)
        assert info["mode"] == "hybrid"
        assert info["flags"]["meter"] & TO_GFX
        assert not info["flags"]["meter"] & FROM_GFX
        assert info["flags"]["ui_gain"] & FROM_GFX
        assert info["flags"].get("disp", 0) == 0

    def test_legacy_default_syncs_everything(self):
        prog = compile_plugin_source("@sample\nx = spl0;\nspl0 = x;\n")
        info = analyze_gfx_var_sync(prog)
        assert info["mode"] == "legacy"
        assert all(f == (TO_GFX | FROM_GFX) for f in info["flags"].values())
        assert info["mem_shared"]

    def test_ui_only(self):
        prog = compile_plugin_source(
            "options: ownership=ui_only\n@sample\nx = spl0;\n")
        info = analyze_gfx_var_sync(prog)
        assert all(f == 0 for f in info["flags"].values())
        assert not info["mem_shared"]

    def test_catalog_ddt_meters_flow_to_gfx(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        info = analyze_gfx_var_sync(prog)
        # DDT is legacy-mode (no ownership option)
        assert info["mode"] == "legacy"
        # but the raw usage sets still show meter traffic
        assert "m_dirE" in info["audio_writes"]
        assert "m_dirE" in info["gfx_reads"]


class TestSerialize:
    def test_serialize_section_compiles_and_runs(self):
        src = ("@init\ncnt = 3;\n"
               "@serialize\nser_ran += 1;\nsaved = cnt * 10;\n"
               "@sample\nspl0 = cnt;\n")
        p = compile_shadow(compile_plugin_source(src))
        p.run_init()
        p.run_serialize()
        assert p.state.V["ser_ran"] == 1.0
        assert p.state.V["saved"] == 30.0

    def test_serialize_not_validated_as_dsp(self):
        # @serialize may reference host-serialization file API without
        # tripping the @block-only legality rules
        src = "@serialize\nfile_var(0, x);\n@sample\nspl0 = x;\n"
        prog = compile_plugin_source(src)  # must not raise
        assert prog.sections["serialize"]
