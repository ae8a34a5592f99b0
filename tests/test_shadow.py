"""Golden-interpreter tests: exact EEL2 numeric semantics + catalog smoke."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.shadow import compile_shadow
from zorak_tpu.semantics import scalar as SC


def run_init(src: str):
    p = compile_shadow(compile_plugin_source(src))
    p.run_init()
    return p


class TestNumericSemantics:
    def test_int_ops_truncate_and_wrap(self):
        p = run_init("@init\n"
                     "a = 7.9 | 0;\n"          # trunc -> 7
                     "b = -7.9 | 0;\n"         # trunc toward zero -> -7
                     "c = 5 & 3;\n"
                     "d = 1 << 33;\n"          # shift count masked & 31 -> 1<<1
                     "e = -8 >> 1;\n"          # arithmetic -> -4
                     "f = 4294967296 | 0;\n"   # wraps mod 2^32 -> 0
                     "g = 7 % 3;\n"
                     "h = -7 % 3;\n")
        V = p.state.V
        assert V["a"] == 7.0 and V["b"] == -7.0 and V["c"] == 1.0
        assert V["d"] == 2.0
        assert V["e"] == -4.0
        assert V["f"] == 0.0
        assert V["g"] == 1.0 and V["h"] == -1.0

    def test_pow_and_div(self):
        p = run_init("@init\na = 2^10;\nb = 1/0;\nc = -1/0;\nd = 0/0;\ne = (-8)^(1/3);\n")
        V = p.state.V
        assert V["a"] == 1024.0
        assert V["b"] == float("inf") and V["c"] == -float("inf")
        assert V["d"] != V["d"]  # NaN
        assert V["e"] != V["e"]  # C pow(-8, 0.333..) = NaN

    def test_comparisons_and_logic(self):
        p = run_init("@init\na = 1 < 2;\nb = 2 <= 1;\nc = (1 && 0) || 1;\n"
                     "d = !0;\ne = !3;\nf = 0/0 ? 10 : 20;\n")
        V = p.state.V
        assert (V["a"], V["b"], V["c"], V["d"], V["e"]) == (1.0, 0.0, 1.0, 1.0, 0.0)
        assert V["f"] == 20.0  # NaN is falsy (ordered compare)

    def test_ternary_implicit_else_and_loop(self):
        p = run_init("@init\nx = 0;\nv = loop(5, x += 2);\ny = 0 ? 9;\n")
        assert p.state.V["x"] == 10.0
        assert p.state.V["v"] == 10.0  # loop returns last body value
        assert p.state.V["y"] == 0.0

    def test_mem_addressing(self):
        p = run_init("@init\n"
                     "buf = 100;\n"
                     "buf[5] = 42;\n"           # mem[105]
                     "a = mem[105];\n"
                     "mem[-3] = 7;\n"           # clamps to mem[0]
                     "b = mem[0];\n"
                     "c = buf[4.9999];\n"       # trunc(104.9999+1e-5) = 104 -> 0
                     "d = buf[4.999999];\n")    # +1e-5 pushes over -> 105
        V = p.state.V
        assert V["a"] == 42.0 and V["b"] == 7.0
        assert V["c"] == 0.0 and V["d"] == 42.0

    def test_memset_memcpy(self):
        p = run_init("@init\nmemset(10, 3.5, 4);\nmemcpy(20, 10, 4);\n"
                     "s = mem[20] + mem[23] + mem[24];\n")
        assert p.state.V["s"] == 7.0

    def test_rand_deterministic_per_instance(self):
        p1 = run_init("@init\na = rand(1); b = rand(1); c = rand(100);\n")
        p2 = run_init("@init\na = rand(1); b = rand(1); c = rand(100);\n")
        assert p1.state.V["a"] == p2.state.V["a"]
        assert p1.state.V["b"] == p2.state.V["b"]
        assert 0.0 <= p1.state.V["a"] <= 1.0
        assert 0.0 <= p1.state.V["c"] <= 100.0
        assert p1.state.V["a"] != p1.state.V["b"]

    def test_user_function_with_instance_namespaces(self):
        src = """\
@init
function lp_set(a) instance(coef) ( coef = a; );
function lp_run(x) instance(coef, z) ( z = (1-coef)*x + coef*z; z );
fL.lp_set(0.5);
fR.lp_set(0.25);
outL = fL.lp_run(1.0);
outR = fR.lp_run(1.0);
outL2 = fL.lp_run(1.0);
"""
        p = run_init(src)
        V = p.state.V
        assert V["outL"] == 0.5
        assert V["outR"] == 0.75
        assert V["outL2"] == 0.75  # z persisted per-namespace
        assert V["fL.coef"] == 0.5 and V["fR.coef"] == 0.25

    def test_persistent_function_locals(self):
        src = """\
@init
function counter() local(n) ( n += 1; n );
a = counter();
b = counter();
"""
        p = run_init(src)
        assert p.state.V["a"] == 1.0 and p.state.V["b"] == 2.0

    def test_while_and_seq_value(self):
        p = run_init("@init\ni = 0;\nwhile (i < 10) ( i += 3; );\n"
                     "q = (1; 2; 3);\n")
        assert p.state.V["i"] == 12.0
        assert p.state.V["q"] == 3.0

    def test_dynamic_slider_spl(self):
        p = run_init("@init\nslider(3) = 0.5;\nx = slider(3);\ny = slider(99);\n"
                     "spl(2) = 0.25;\nz = spl(2);\n")
        assert p.state.sliders[2] == 0.5
        assert p.state.V["x"] == 0.5 and p.state.V["y"] == 0.0
        assert p.state.spl[2] == 0.25 and p.state.V["z"] == 0.25

    def test_string_handles(self):
        p = run_init('@init\nh = "hello";\nn = strlen(h);\nc = str_getchar(h, 1);\n')
        assert p.state.V["n"] == 5.0
        assert p.state.V["c"] == float(ord("e"))

    def test_invsqrt_bit_trick(self):
        p = run_init("@init\ny = invsqrt(4);\n")
        # approximation, not exact 0.5
        assert abs(p.state.V["y"] - 0.5) < 0.01
        assert p.state.V["y"] != 0.5

    def test_eval_order_rhs_before_target_index(self):
        # rhs runs first and may change the index used by the target
        p = run_init("@init\ni = 1;\nmem[i] = (i = 3; 9);\na = mem[3];\nb = mem[1];\n")
        assert p.state.V["a"] == 9.0 and p.state.V["b"] == 0.0


class TestProcessBlock:
    def test_gain_plugin(self):
        src = "@slider\ng = slider1;\n@sample\nspl0 *= g;\nspl1 *= g;\n"
        p = compile_shadow(compile_plugin_source(src))
        p.run_init()
        p.state.sliders[0] = 0.5
        p.run_slider()
        x = np.ones((2, 16), dtype=np.float32)
        y = np.zeros((2, 16), dtype=np.float32)
        p.process_block(x, y)
        assert np.allclose(y, 0.5)

    def test_block_runs_before_samples(self):
        src = "@block\nn = samplesblock;\n@sample\nspl0 = n;\n"
        p = compile_shadow(compile_plugin_source(src))
        p.run_init()
        x = np.zeros((1, 8), dtype=np.float32)
        y = np.zeros((1, 8), dtype=np.float32)
        p.process_block(x, y)
        assert np.all(y == 8.0)

    def test_sliderchange_triggers_slider_rerun(self):
        src = ("@slider\nd = slider1 * 2;\n"
               "@block\nc += 1; c == 2 ? ( slider1 = 7; sliderchange(slider1); );\n"
               "@sample\nspl0 = d;\n")
        p = compile_shadow(compile_plugin_source(src))
        p.run_init()
        x = np.zeros((1, 4), dtype=np.float32)
        y = np.zeros((1, 4), dtype=np.float32)
        p.process_block(x, y)
        assert np.all(y == 0.0)
        p.process_block(x, y)  # @block sets slider1=7 + pending -> @slider reruns
        assert np.all(y == 14.0)


class TestCatalogSmoke:
    """Run real reference plugins through @init/@slider and a short block."""

    PLUGINS = [
        "Spatialization/DDT/src/DDT.jsfx",
        "Spatialization/DPT/src/DPT.jsfx",
        "Dynamics/ATTACK/src/ATTACK.jsfx",
        "Dynamics/EasyExpander/src/EasyExpander.jsfx",
        "Ambience/ADS/src/ADS.jsfx",
        "Spectral/ERBTilt/src/ERB Tilt.jsfx",
        "Spectral/SpectralStabilizer/src/Spectral Stabilizer.jsfx",
    ]

    @pytest.mark.parametrize("rel", PLUGINS)
    def test_init_slider_and_block(self, reference_plugins, rel):
        prog = load_plugin_file(reference_plugins / rel)
        p = compile_shadow(prog)
        p.state.srate = 48000.0
        # host pushes default slider values BEFORE @init (REAPER semantics,
        # ref: src/JSFXJuceProcessor.cpp:3297-3305)
        for d in prog.slider_decls:
            p.state.sliders[d.index0] = d.default
        p.run_init()
        p.run_slider()

        ch = prog.io_channels["process"]
        n = 64
        rng = np.random.RandomState(7)
        x = rng.randn(ch, n).astype(np.float32) * 0.25
        y = np.zeros((ch, n), dtype=np.float32)
        p.process_block(x, y)
        assert np.all(np.isfinite(y)), rel
        # determinism: same plugin, same input -> same output
        p2 = compile_shadow(prog)
        p2.state.srate = 48000.0
        for d in prog.slider_decls:
            p2.state.sliders[d.index0] = d.default
        p2.run_init()
        p2.run_slider()
        y2 = np.zeros((ch, n), dtype=np.float32)
        p2.process_block(x, y2)
        assert np.array_equal(y, y2), rel

    def test_ddt_produces_wet_signal(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        p = compile_shadow(prog)
        p.state.srate = 48000.0
        for d in prog.slider_decls:
            p.state.sliders[d.index0] = d.default
        p.run_init()
        p.run_slider()
        n = 2048
        x = np.zeros((2, n), dtype=np.float32)
        x[:, 0] = 1.0  # impulse
        y = np.zeros((2, n), dtype=np.float32)
        p.process_block(x, y)
        # direct path passes plus delayed reflections later in the tail
        assert np.any(np.abs(y[:, 1:]) > 1e-6)
        assert np.all(np.isfinite(y))
