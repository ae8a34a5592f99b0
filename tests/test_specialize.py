"""Vectorizing specializer: null tests vs the golden shadow interpreter."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin


def noise(nch, n, scale=0.5, seed=3):
    return (np.random.RandomState(seed).randn(nch, n) * scale).astype(np.float32)


class TestBasicKernels:
    def test_pure_gain(self):
        src = "@init\ng = 0.5;\n@sample\nspl0 *= g;\nspl1 *= g;\n"
        rep = null_test_plugin(compile_plugin_source(src), noise(2, 3000))
        assert rep.passed, rep.summary()
        assert rep.max_abs_delta == 0.0

    def test_elementwise_math(self):
        src = ("@sample\n"
               "x = spl0;\n"
               "spl0 = sin(x) + 0.25*sqrt(abs(x)) - min(x, 0.3);\n"
               "spl1 = max(spl1, -0.2) + sign(x)*0.01;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(2, 2000))
        assert rep.audio_passed, rep.summary()

    def test_data_dependent_select(self):
        src = ("@sample\n"
               "spl0 > 0.5 ? spl0 = 0.5 : (spl0 < -0.5 ? spl0 = -0.5);\n"
               "spl1 = spl1 > 0 ? spl1*2 : spl1*0.5;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(2, 2000, scale=1.0))
        assert rep.passed, rep.summary()

    def test_one_pole_recurrence(self):
        src = ("@init\na = 0.995;\n"
               "@sample\nz = (1-a)*spl0 + a*z;\nspl0 = z;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 6000))
        assert rep.audio_passed, rep.summary()
        # state z after render must agree closely, too
        assert not [m for m in rep.var_mismatches if m[0] == "z"], rep.var_mismatches

    def test_time_varying_coefficient_recurrence(self):
        # coefficient depends on the INPUT (not the state) -> still linear
        src = ("@sample\n"
               "a = 0.9 + 0.05*min(abs(spl0), 1);\n"
               "z = (1-a)*spl0 + a*z;\n"
               "spl0 = z;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4000))
        assert rep.audio_passed, rep.summary()

    def test_induction_counter(self):
        src = ("@sample\n"
               "n += 1;\n"
               "spl0 = n;\n")
        prog = compile_plugin_source(src)
        rep = null_test_plugin(prog, np.zeros((1, 5000), dtype=np.float32))
        assert rep.passed, rep.summary()

    def test_ring_buffer_delay(self):
        src = ("@init\nBUFLEN = 1024; MASK = BUFLEN - 1; d = 300;\n"
               "@sample\n"
               "buf[w & MASK] = spl0;\n"
               "spl0 = 0.5*spl0 + 0.5*buf[(w - d) & MASK];\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 5000),
                               segment_len=1536)
        assert rep.passed, rep.summary()

    def test_ring_delay_crossing_segments(self):
        # delay longer than the segment: history must survive segment hops
        src = ("@init\nMASK = 255; d = 200;\n"
               "@sample\nbuf[w & MASK] = spl0;\n"
               "spl0 = buf[(w - d) & MASK];\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 1000),
                               segment_len=128)
        assert rep.passed, rep.summary()

    def test_unrolled_tap_loop(self):
        src = ("@init\n"
               "tap = 1000; g = 1100; buf = 0;\n"
               "i = 0;\nloop(8, tap[i] = 16 + i*7; g[i] = 0.1 + 0.05*i; i += 1;);\n"
               "MASK = 511;\n"
               "@sample\n"
               "buf[w & MASK] = spl0;\n"
               "acc = 0;\n"
               "i = 0;\n"
               "loop(8, acc += g[i]*buf[(w - tap[i]) & MASK]; i += 1;);\n"
               "spl0 = acc;\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000))
        assert rep.passed, rep.summary()

    def test_mem_cell_accumulator(self):
        # concrete-address mem cell carrying state across samples
        src = "@sample\nmem[7] += spl0;\nspl0 = mem[7];\n"
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 2000, scale=0.01))
        assert rep.audio_passed, rep.summary()

    def test_int_ops_on_series(self):
        src = ("@sample\n"
               "q = (spl0 * 1000) | 0;\n"
               "spl0 = (q & 15) / 16 + (q % 7) * 0.001;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 2000))
        assert rep.passed, rep.summary()

    def test_user_functions_inline(self):
        src = ("@init\n"
               "function clamp(x a b) ( x < a ? a : (x > b ? b : x) );\n"
               "function lp(x) instance(z) ( z = 0.9*z + 0.1*x; z );\n"
               "@sample\n"
               "spl0 = f.lp(clamp(spl0, -0.5, 0.5));\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000))
        assert rep.audio_passed, rep.summary()


class TestUnsupportedFallsOut:
    def test_countdown_while_vectorizes(self):
        # unit-step range loops are the wrap-normalize shape: handled
        src = "@sample\ni = spl0*10;\nwhile (i > 0) ( i -= 1; );\nspl0 = i;\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               noise(1, 1200, scale=0.4, seed=31),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_general_while_loop_rejected(self):
        # multiplicative update: not a wrap-normalize; honest rejection
        src = ("@sample\ni = spl0*10;\n"
               "while (i > 1) ( i = i * 0.25; );\nspl0 = i;\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 1)

    def test_audio_coupled_block_goes_device(self):
        # @block reading @sample-written state switches to the fused
        # device pipeline instead of falling out (see test_coupled_block)
        src = "@sample\nacc += abs(spl0);\nspl0 *= g;\n@block\ng = 1/(1 + acc*0.001);\n"
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, shadow.state, 1)
        assert kern.coupled


class TestBlockControlTrajectory:
    def test_block_counter_stream(self):
        src = "@block\nc += 1;\n@sample\nspl0 = c;\n"
        rep = null_test_plugin(compile_plugin_source(src),
                               np.zeros((1, 2048), dtype=np.float32),
                               block_size=256, segment_len=512)
        assert rep.passed, rep.summary()

    def test_block_modulated_gain(self):
        src = ("@block\nphase += 0.1;\ng = 0.5 + 0.4*sin(phase);\n"
               "@sample\nspl0 *= g;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4096),
                               block_size=512, segment_len=1024)
        assert rep.passed, rep.summary()

    def test_block_with_linrec_in_sample(self):
        src = ("@block\ntarget = (blk += 1) % 7;\n"
               "@sample\nz = 0.99*z + 0.01*target;\nspl0 = spl0 + z*0.1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000),
                               block_size=128, segment_len=1024)
        assert rep.audio_passed, rep.summary()

    def test_sliderchange_retriggers_slider_in_trajectory(self):
        src = ("@slider\nd = slider1 * 2;\n"
               "@block\nc += 1; c == 3 ? ( slider1 = 5; sliderchange(slider1); );\n"
               "@sample\nspl0 = d;\n")
        rep = null_test_plugin(compile_plugin_source(src),
                               np.zeros((1, 2048), dtype=np.float32),
                               block_size=256, segment_len=512)
        assert rep.audio_passed, rep.summary()

    def test_catalog_erbtilt_null(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spectral/ERBTilt/src/ERB Tilt.jsfx")
        x = noise(2, 6000, scale=0.3)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"ERBTilt not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()

    def test_delay_feedforward_through_ring_supported(self):
        # ring write fed by a nonlinear recurrence, read only toward the
        # output: feed-forward, solvable (scan first, then the delay)
        src = ("@init\nMASK=255;\n"
               "@sample\nz = z*z*0.5 + spl0*0.1;\nbuf[w & MASK] = z;\n"
               "spl0 = buf[(w-10) & MASK];\nw += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src),
                               noise(1, 3000, scale=0.3))
        assert rep.audio_passed, rep.summary()

    def test_delay_feedback_into_scan_group_rejected(self):
        # the recurrence consumes its own delayed output: true delay-line
        # feedback through the ring — cannot be ordered vectorized
        src = ("@init\nMASK=255;\n"
               "@sample\nd = buf[(w-10) & MASK];\n"
               "z = z*z*0.5 + spl0 + 0.3*d;\nbuf[w & MASK] = z;\n"
               "spl0 = d;\nw += 1;\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 1)


class TestModRing:
    """Wrapped (mod-M) cursor counters — the JSFX circular-buffer idiom
    with a conditional reset instead of a pow2 mask (ref: SOMA.jsfx:550,
    Roomalizer.jsfx:366, Alias.jsfx:106)."""

    def test_nonpow2_wrapped_counter_delay(self):
        src = ("@init\nM = 100;\n"
               "@sample\nbuf[p] = spl0;\n"
               "r = p - 37; r < 0 ? r += M;\n"
               "spl0 = 0.5*spl0 + buf[r];\n"
               "p += 1; p >= M ? p = 0;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 6000),
                               segment_len=2048)
        assert rep.audio_passed, rep.summary()

    def test_wrap_by_subtract(self):
        src = ("@init\nM = 77;\n"
               "@sample\nbuf[p] = spl0;\n"
               "r = p - 11; r < 0 ? r += M;\n"
               "spl0 = buf[r];\n"
               "p += 1; p >= M ? p -= M;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 5000),
                               segment_len=1024)
        assert rep.audio_passed, rep.summary()

    def test_masked_update_counter(self):
        # cursor advanced by re-masking instead of a conditional reset
        src = ("@sample\nbuf[p] = spl0;\n"
               "q = p - 5; q < 0 ? q += 8;\n"
               "spl0 = buf[q];\n"
               "p = (p + 1) & 7;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4000),
                               segment_len=512)
        assert rep.audio_passed, rep.summary()

    def test_slewed_dynamic_tap(self):
        # DPT-style: audio-independent per-sample delay offset, pow2 ring
        src = ("@init\nMASK = 1023;\n"
               "@sample\nmem[w & MASK] = spl0;\n"
               "d += (200 - d) * 0.001;\n"
               "di = floor(d + 0.5);\n"
               "spl0 = mem[(w - di) & MASK];\nw += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 6000),
                               segment_len=2048)
        assert rep.audio_passed, rep.summary()


class TestGatedDynWrite:
    """Write-only metering histories: `cond ? (hist[wpos] = v; wpos += 1;
    wpos >= M ? wpos = 0)` — gated dynamic scatters with last-writer
    resolution (the SOMA.jsfx:713-721 shape)."""

    def test_decimated_history_write(self):
        src = ("@init\nHIST = 900;\n"
               "@sample\npeak = max(peak, abs(spl0));\ncnt += 1;\n"
               "cnt >= 37 ? (\n"
               "  HIST[wpos] = peak;\n"
               "  wpos += 1; wpos >= 50 ? wpos = 0;\n"
               "  cnt = 0; peak = 0;\n"
               ");\nspl0 = spl0 * 0.5;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 6000),
                               segment_len=2048, compare_state=True)
        assert rep.passed, rep.summary()

    def test_every_sample_dynamic_write(self):
        # ungated dynamic write through a wrapped var cursor (no mask op
        # at the write site)
        src = ("@init\nTAB = 400;\n"
               "@sample\nTAB[p] = spl0;\n"
               "p += 1; p >= 100 ? p = 0;\n"
               "spl0 = 0.25 * spl0;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4000),
                               segment_len=1024, compare_state=True)
        assert rep.passed, rep.summary()

    def test_read_of_dyn_region_rejected(self):
        # gated writes have no read resolution: reading the region falls out
        src = ("@init\nTAB = 400;\n"
               "@sample\ncnt += 1;\n"
               "cnt >= 7 ? (TAB[w] = spl0; w += 1; w >= 16 ? w = 0; cnt = 0;);\n"
               "spl0 = TAB[3];\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 1)


class TestScanGroup:
    def test_nonlinear_self_recurrence(self):
        src = "@sample\nz = z*0.9 + z*z*0.01 + spl0*0.1;\nspl0 = z;\n"
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000, scale=0.3))
        assert rep.audio_passed, rep.summary()

    def test_attack_release_envelope(self):
        # classic state-dependent coefficient follower
        src = ("@init\na_att = 0.6; a_rel = 0.999;\n"
               "@sample\nr = abs(spl0);\n"
               "env = r > env ? a_att*env + (1-a_att)*r : a_rel*env + (1-a_rel)*r;\n"
               "spl0 = env;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4000))
        assert rep.audio_passed, rep.summary()
        bad = [m for m in rep.var_mismatches if abs(m[1] - m[2]) > 1e-9]
        assert not bad, bad

    def test_mutually_recursive_pair(self):
        src = ("@sample\n"
               "a2 = 0.95*b + 0.05*spl0;\n"
               "b = 0.9*a2 + 0.1*abs(spl0);\n"
               "spl0 = a2 - b;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 2500))
        assert rep.audio_passed, rep.summary()

    def test_group_feeding_from_vectorized_delay(self):
        # delay line feeds the sequential follower (no feedback into it)
        src = ("@init\nMASK = 511; d = 100;\n"
               "@sample\nbuf[w & MASK] = spl0;\n"
               "late = buf[(w - d) & MASK];\n"
               "pk = abs(late) > pk ? abs(late) : pk*0.995;\n"
               "spl0 = late * (1 - 0.5*pk);\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000),
                               segment_len=1024)
        assert rep.passed, rep.summary()

    def test_catalog_attack_null(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Dynamics/ATTACK/src/ATTACK.jsfx")
        x = noise(2, 6000, scale=0.3)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"ATTACK not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()

    def test_catalog_easyexpander_null(self, reference_plugins):
        prog = load_plugin_file(
            reference_plugins / "Dynamics/EasyExpander/src/EasyExpander.jsfx")
        x = noise(2, 6000, scale=0.3)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"EasyExpander not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()


class TestDDTNull:
    """North-star: DDT through the vector engine vs the golden shadow."""

    def test_ddt_default_sliders(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        x = noise(2, 12000, scale=0.25)
        rep = null_test_plugin(prog, x, segment_len=4096, compare_state=False)
        assert rep.audio_passed, rep.summary()
        # expect far better than the 1e-5 contract on CPU
        assert rep.max_abs_delta < 1e-7, rep.summary()

    def test_ddt_extreme_quality(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        x = noise(2, 8000, scale=0.25)
        rep = null_test_plugin(
            prog, x, segment_len=4096, compare_state=False,
            slider_overrides={4: 4.0, 0: 80.0, 8: 90.0})  # Extreme, far, big room
        assert rep.audio_passed, rep.summary()

    def test_ddt_state_parity(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DDT/src/DDT.jsfx")
        x = noise(2, 4000, scale=0.25)
        rep = null_test_plugin(prog, x, segment_len=1024, compare_state=True)
        # meters/filters accumulate tiny scan-order differences; audio is the
        # contract, state vars must still be close
        assert rep.audio_passed, rep.summary()
        bad = [m for m in rep.var_mismatches if abs(m[1] - m[2]) > 1e-6]
        assert not bad, bad


class TestSettledGuards:
    """Optimistic settled constants: re-init guards whose condition folds
    false against the snapshot must not force their branch's state (or
    non-vectorizable constructs) into the carried set
    (ref shape: Alias.jsfx @sample `srate != last_srate ? update_coeffs()`)."""

    def test_dead_reinit_guard_folds(self):
        src = """@init
last = srate;
g = 0.25;
@sample
srate != last ? (
  last = srate;
  while (spl0 > 0) ( spl0 = spl0 * 0.5 - 1; );  // rejected if live
  g = 0.5;
);
spl0 = spl0 * g;
"""
        prog = compile_plugin_source(src)
        x = noise(1, 3000, scale=0.4)
        rep = null_test_plugin(prog, x, segment_len=1024)
        assert rep.passed, rep.summary()

    def test_live_guard_still_carries(self):
        # the guard DOES fire (snapshot mismatch): honest rejection of the
        # data-dependent while inside it
        src = """@init
last = 0;
g = 0.25;
@sample
srate != last ? (
  last = srate;
  while (spl0 > 0) ( spl0 = spl0 * 0.5 - 1; );
  g = 0.5;
);
spl0 = spl0 * g;
"""
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 1)


class TestMultiWriterRing:
    """Several delay-line 'instances' sharing one buffer (never pointed at
    distinct bases): every write lands on the same slot per sample; reads
    resolve by program order (ref shape: Alias.jsfx intdelay, buf unset)."""

    SRC = """@init
function idel(x, ds) instance(buf, pos) local(rp, o) (
  buf[pos] = x;
  rp = pos - ds;
  rp < 0 ? rp += 64;
  o = buf[rp];
  pos = (pos + 1) & 63;
  o;
);
@sample
a = d1.idel(spl0 * 0.9, 13);
b = d2.idel(spl0 - 0.2, 29);
spl0 = 0.5 * a + 0.25 * b;
"""

    def test_two_writers_null(self):
        prog = compile_plugin_source(self.SRC)
        x = noise(1, 2000, scale=0.4, seed=11)
        rep = null_test_plugin(prog, x, segment_len=512)
        assert rep.passed, rep.summary()

    def test_zero_delay_reads_own_write(self):
        src = self.SRC.replace("13)", "0)")
        prog = compile_plugin_source(src)
        x = noise(1, 1500, scale=0.4, seed=12)
        rep = null_test_plugin(prog, x, segment_len=512)
        assert rep.passed, rep.summary()


class TestWrapNormalizeWhile:
    """`while (a > 180) a -= 360;` lowers to one vector-wide masked
    fixpoint loop, bit-exact to per-element repeated subtraction
    (ref shape: 3DPanner.jsfx:137-138)."""

    def test_angle_wrap_null(self):
        src = """@sample
a = spl0 * 1000;
while (a > 180) ( a -= 360; );
while (a < -180) ( a += 360; );
spl0 = a / 360;
"""
        prog = compile_plugin_source(src)
        x = noise(1, 3000, scale=0.9, seed=21)
        rep = null_test_plugin(prog, x, segment_len=1024)
        assert rep.passed, rep.summary()

    def test_wrap_feeding_recurrence(self):
        src = """@sample
ph += 0.37 + spl0;
while (ph > 1) ( ph -= 2; );
spl0 = ph * 0.5;
"""
        prog = compile_plugin_source(src)
        x = noise(1, 2500, scale=0.3, seed=22)
        rep = null_test_plugin(prog, x, segment_len=1024)
        assert rep.passed, rep.summary()


class TestScopedBranchMerge:
    """Conditional assignment to function params/locals must select-merge,
    not leak the then-arm binding (the clamp-helper bug Contour's state
    compare caught: `function cl(v,lo,hi)(v<lo?v=lo; v>hi?v=hi; v)`)."""

    def test_clamp_helper_param_mutation(self):
        src = ("@init\n"
               "function cl(v, lo, hi) ( v < lo ? v = lo; v > hi ? v = hi; v; );\n"
               "@sample\n"
               "e = 0.9*e + 0.1*abs(spl0);\n"
               "g = cl(e, 0.2, 1);\n"
               "spl0 = spl0 * (0.5 + 0.1*g);\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000))
        assert rep.passed, rep.summary()

    def test_branch_assign_in_logical_and(self):
        src = ("@init\n"
               "function f(v) ( (v > 0.1) && (v = v * 2; 1); v; );\n"
               "@sample\n"
               "e = 0.9*e + 0.1*abs(spl0);\n"
               "spl0 = spl0 * (0.5 + 0.1*f(e));\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000))
        assert rep.passed, rep.summary()

    def test_cond_expr_over_params(self):
        src = ("@init\n"
               "function pick(v, w) ( v > w ? v : w; );\n"
               "@sample\n"
               "e = 0.9*e + 0.1*abs(spl0);\n"
               "spl0 = spl0 * (0.5 + 0.1*pick(e, 0.3));\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000))
        assert rep.passed, rep.summary()


class TestResumedRenders:
    def test_block_trajectory_continues_across_renders(self):
        # @block state (counters/LFOs) persists across separate render
        # calls, like the reference's long-lived state struct
        src = ("@init\ng = 0;\n"
               "@block\nbc += 1;\ng = 0.5 + 0.4 * sin(bc * 0.1);\n"
               "@sample\nspl0 *= g;\n")
        from zorak_tpu.shadow import compile_native_shadow
        from zorak_tpu.verify.nulltest import apply_slider_state

        prog = compile_plugin_source(src)
        x = noise(1, 2048)
        xx = np.concatenate([x, x, x], axis=1)
        gold = compile_native_shadow(prog)
        gold.state.srate = 48000.0
        apply_slider_state(gold.state, prog, None)
        gold.run_init()
        gold.run_slider()
        y_ref = np.zeros_like(xx)
        for s in range(0, xx.shape[1], 512):
            gold.process_block(xx[:, s:s + 512], y_ref[:, s:s + 512])

        snap = make_initialized_shadow(prog, 48000.0, None)
        kern = specialize_sample_kernel(prog, snap.state, 1, 2048,
                                        block_size=512)
        y1, c = kern.render(x)
        y2, c = kern.render(x, carry=c)
        y3, c = kern.render(x, carry=c)
        y = np.concatenate([y1, y2, y3], axis=1)
        assert np.abs(y - y_ref).max() == 0.0
        kern.writeback(c, snap.state)
        assert snap.state.V.get("bc") == gold.state.V.get("bc")
