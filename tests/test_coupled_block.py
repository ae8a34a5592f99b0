"""Fused block/sample device pipeline: audio-coupled @block sections
(meters, accumulator resets, shared mem) run as device code between
vectorized sample segments — null-tested bit-exact against the golden,
including full state compare across block boundaries."""
import numpy as np

from zorak_tpu.ir.program import compile_plugin_source
from zorak_tpu.lowering import specialize_sample_kernel
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin


def noise(nch, n, scale=0.4, seed=3):
    return (np.random.RandomState(seed).randn(nch, n) * scale).astype(
        np.float32)


def _kernel(src, nch=1):
    prog = compile_plugin_source(src)
    shadow = make_initialized_shadow(prog)
    return prog, specialize_sample_kernel(prog, shadow.state, nch,
                                          segment_len=4096)


def test_hot_meter_read():
    # @block consumes a meter @sample accumulates -> coupled regime
    src = """
@init
g = 1;
@block
avg = acc / max(samplesblock, 1);
g = 1 / (1 + avg*avg);
acc = 0;
@sample
acc += abs(spl0);
spl0 = spl0 * g;
"""
    prog, kern = _kernel(src)
    assert kern.coupled
    rep = null_test_plugin(prog, noise(1, 6100), segment_len=4096,
                           golden="native", compare_state=True)
    assert rep.passed, rep.summary()


def test_block_rewrites_audio_state():
    src = """
@block
env = env * 0.5;
@sample
env = max(abs(spl0), env * 0.999);
spl0 = spl0 / (1 + env);
"""
    prog, kern = _kernel(src)
    assert kern.coupled
    rep = null_test_plugin(prog, noise(1, 6100), segment_len=4096,
                           golden="native", compare_state=True)
    assert rep.passed, rep.summary()


def test_shared_mem_ring_and_table():
    # @sample writes a ring @block scans; @block writes a table @sample reads
    src = """
@init
MASK = 255; tab = 1000;
@block
s = 0; i = 0;
while(i < 16) ( s += buf[i]; i += 1; );
tab[0] = s / 16;
@sample
buf[w & MASK] = spl0;
w += 1;
spl0 = spl0 - tab[0];
"""
    prog, kern = _kernel(src)
    assert kern.coupled
    rep = null_test_plugin(prog, noise(1, 6100), segment_len=2048,
                           golden="native", compare_state=True)
    assert rep.passed, rep.summary()


def test_fft_in_coupled_block():
    # @block FFTs a buffer @sample fills (the DOT.jsfx shape)
    src = """
@init
FS = 64; buf = 4096; spec = 8192;
@block
i = 0;
loop(FS, spec[2*i] = buf[i]; spec[2*i+1] = 0; i += 1;);
fft(spec, FS);
fft_permute(spec, FS);
mag0 = sqrt(spec[2]*spec[2] + spec[3]*spec[3]);
@sample
buf[wp] = spl0;
wp += 1; wp >= FS ? wp = 0;
spl0 = spl0 * 0.5 + mag0 * 0.001;
"""
    prog, kern = _kernel(src)
    assert kern.coupled
    rep = null_test_plugin(prog, noise(1, 5000), segment_len=2048,
                           golden="native", compare_state=True)
    assert rep.passed, rep.summary()


def test_uncoupled_stays_on_host_trajectory():
    # audio-independent @block must keep the cheap host-trajectory path
    src = """
@block
t += 1;
g = 0.5 + 0.4 * sin(t * 0.1);
@sample
spl0 = spl0 * g;
"""
    prog, kern = _kernel(src)
    assert not kern.coupled
    rep = null_test_plugin(prog, noise(1, 5000), segment_len=2048,
                           golden="native", compare_state=True)
    assert rep.passed, rep.summary()
