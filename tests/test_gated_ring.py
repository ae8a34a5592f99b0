"""Gated ring cursors (VERDICT r3 #8 groundwork): wrapped counters that
advance only when a per-sample gate fires, with ring writes inside the
gate's branch and delay taps (static or ctrl-derived dynamic) reading
carry history — the ctrl-gated delay-tank idiom of 3DPanner's sceneverb
FDN (ref 3DPanner.jsfx:2440-2462):

    active ? (
      t = buf[(w - d) & mask];      // d >= segment (time-blocked)
      ...IIRs...
      buf[w] = feed;                // write fires iff cursor advances
      w = (w + 1) & mask;
    );

The specializer models the cursor as anchor + gate-prefix (GRingIdx),
vectorizes taps as history gathers at cumsum-derived indices, writes
back with one gate-masked scatter, and interval-bounds ctrl-derived tap
delays (clamp idioms lower to relational selects) so every read is
proven to predate the segment.  All bit-exact vs the native C golden."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin

TANK_SRC = """\
desc:gated delay tank (synthetic)
@init
MASK = 8191;
w = 0; lp = 0;
@sample
g = abs(spl0) > %THRESH%;
g ? (
  t1 = 0[(w - 4096) & MASK];
  t2 = 0[(w - 4100) & MASK];
  lp = 0.6*lp + 0.4*(t1 - 0.5*t2);
  0[w] = spl0*0.5 + lp*0.3;
  w = (w + 1) & MASK;
);
spl0 = spl0 + lp * 0.2;
spl1 = spl1;
"""

DYN_SRC = """\
desc:gated tank with ctrl-derived dynamic taps
@init
MASK = 8191;
w = 0; lp = 0; bsize = 0;
@block
bsize = bsize + 0.013;
bsize > 1 ? bsize = 0;
@sample
sz = bsize;
sz < 0 ? sz = 0;
sz > 1 ? sz = 1;
d = floor(4096 + 500*sz);
g = abs(spl0) > 0.1;
g ? (
  t1 = 0[(w - d) & MASK];
  lp = 0.6*lp + 0.4*t1;
  0[w] = spl0*0.5 + lp*0.3;
  w = (w + 1) & MASK;
);
spl0 = spl0 + lp * 0.2;
spl1 = spl1;
"""


def _null(src: str, x: np.ndarray):
    prog = compile_plugin_source(src)
    rep = null_test_plugin(prog, x, 48000.0, block_size=512,
                           compare_state=True, compare_mem=True,
                           golden="native")
    assert rep.passed, rep.summary()


class TestGatedRing:
    def test_audio_gated_tank_bit_exact(self):
        # the gate is AUDIO-dependent: cumsum-prefix cursors handle any
        # gate stream, not just block-constant ones
        prog = compile_plugin_source(TANK_SRC.replace("%THRESH%", "0.1"))
        sh = make_initialized_shadow(prog, 48000.0, None)
        kern = specialize_sample_kernel(prog, sh.state, 2,
                                        segment_len=131072, block_size=512)
        # the 4100-tap forces the time-blocked shrink: L <= M - d_max
        assert kern.L == 3584
        assert kern.plans[("var", "w")].kind == "gmodind"
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, 12288)) * 0.25).astype(np.float32)
        _null(TANK_SRC.replace("%THRESH%", "0.1"), x)

    def test_gate_never_fires_ring_frozen(self):
        # silence below the threshold: cursor frozen, ring untouched
        x = (np.full((2, 4096), 0.01)).astype(np.float32)
        _null(TANK_SRC.replace("%THRESH%", "0.1"), x)

    def test_ctrl_derived_dynamic_tap_bit_exact(self):
        # d = floor(4096 + 500*clamp01(ctrl)): the interval analysis
        # bounds the tap into [4096, 4596] through the clamp selects
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, 12288)) * 0.25).astype(np.float32)
        _null(DYN_SRC, x)

    def test_write_outside_gate_rejected(self):
        # the write must fire exactly when the cursor advances; a write
        # outside the gate branch would interleave G-space positions
        src = TANK_SRC.replace("%THRESH%", "0.1").replace(
            "  0[w] = spl0*0.5 + lp*0.3;\n", "")
        src = src.replace("spl0 = spl0 + lp * 0.2;",
                          "0[w] = spl0*0.5 + lp*0.3;\n"
                          "spl0 = spl0 + lp * 0.2;")
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog, 48000.0, None)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, sh.state, 2,
                                     segment_len=131072, block_size=512)

    def test_short_feedback_rejected(self):
        # a 300-sample tap cannot clear any block-multiple segment
        src = TANK_SRC.replace("%THRESH%", "0.1").replace("4096", "300") \
            .replace("4100", "310")
        prog = compile_plugin_source(src)
        sh = make_initialized_shadow(prog, 48000.0, None)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, sh.state, 2,
                                     segment_len=131072, block_size=512)
