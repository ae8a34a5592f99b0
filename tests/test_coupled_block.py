"""Fused block/sample device pipeline: audio-coupled @block sections
(meters, accumulator resets, shared mem) run as device code between
vectorized sample segments — null-tested bit-exact against the golden,
including full state compare across block boundaries."""
import numpy as np

from zorak_tpu.ir.program import compile_plugin_source
from zorak_tpu.lowering import specialize_sample_kernel
from zorak_tpu.shadow import compile_shadow
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin
from zorak_tpu.verify.nulltest import apply_slider_state


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


def test_file_load_folds_into_coupled_block():
    # file-slot data is static per specialization: a reload-gated
    # open/riff/file_mem/close in @block folds at trace time, merged by
    # the runtime condition (the PsychoConvolver load_raw_ir shape)
    from zorak_tpu.runtime.services import EngineHost
    from zorak_tpu.shadow import compile_shadow
    from zorak_tpu.verify.nulltest import apply_slider_state

    src = """
@init
TAB = 5000;
@block
g = acc / max(samplesblock, 1); acc = 0;
need ? (
  h = file_open(0);
  h > 0 ? (
    nch = 0; sr = 0;
    file_riff(h, nch, sr);
    n = min(file_avail(h), 64);
    file_mem(h, TAB, n);
    loaded = n;
    file_close(h);
  );
  need = 0;
);
@sample
acc += abs(spl0);
spl0 = spl0 * (1/(1+g)) + 0.1 * TAB[0] + 0.01 * TAB[37];
"""
    audio = np.sin(np.arange(200) * 0.21)[None, :] * 0.7
    prog = compile_plugin_source(src)
    host1, host2 = EngineHost(), EngineHost()
    for h in (host1, host2):
        h.files.load_slot(0, audio, srate=48000.0)
    shadow_v = make_initialized_shadow(prog, 48000.0, host=host1)
    shadow_v.state.V["need"] = 1.0
    kern = specialize_sample_kernel(prog, shadow_v.state, 1,
                                    segment_len=2048)
    assert kern.coupled
    x = noise(1, 5000, seed=7, scale=0.3)
    y, _carry = kern.render(x)

    plug = compile_shadow(prog, host=host2)
    plug.state.srate = 48000.0
    apply_slider_state(plug.state, prog, None, None)
    plug.run_init()
    plug.run_slider()
    plug.state.V["need"] = 1.0
    yg = np.zeros_like(x, dtype=np.float64)
    for i in range(0, 5000, 512):
        n = min(512, 5000 - i)
        out = np.zeros((1, n), dtype=np.float64)
        plug.process_block(x[:, i:i + n].astype(np.float64), out, 1)
        yg[:, i:i + n] = out
    assert np.abs(y.astype(np.float64) - yg).max() <= 1e-6


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


def test_coupled_retrigger_runs_device_slider():
    """@block reads audio state AND retriggers @slider: the @slider
    section compiles to device code and re-runs under a cond in the
    fused scan when the pending mask is set (ref: dsp_jsfx_aot.py:
    5788-5804 block-boundary slider-rerun rule)."""
    src = """@slider
g = 0.2 + slider1 * 0.1;
@block
acc_b = acc;
acc > 40 && slider1 < 3 ? (
  slider1 = slider1 + 1;
  sliderchange(slider1);
  acc = 0;
);
@sample
acc += abs(spl0);
spl0 = spl0 * g + 0.001 * acc_b;
"""
    prog = compile_plugin_source(src)
    x = noise(1, 6000, seed=19, scale=0.5)

    plug = compile_shadow(prog)
    plug.state.srate = 48000.0
    apply_slider_state(plug.state, prog, None, None)
    plug.run_init()
    plug.run_slider()
    yg = np.zeros_like(x, dtype=np.float64)
    for i in range(0, 6000, 512):
        n = min(512, 6000 - i)
        out = np.zeros((1, n), dtype=np.float64)
        plug.process_block(x[:, i:i + n].astype(np.float64), out, 1)
        # host semantics: pending masks consumed by the slider re-run
        if plug.state.pending_change_mask:
            plug.run_slider()
            plug.state.pending_change_mask = 0
        yg[:, i:i + n] = out

    shadow_v = make_initialized_shadow(prog, 48000.0)
    kern = specialize_sample_kernel(prog, shadow_v.state, 1,
                                    segment_len=2048)
    assert kern.coupled and kern._devslider is not None
    y, carry = kern.render(x)
    assert np.abs(y.astype(np.float64) - yg).max() <= 1e-6
    # slider writeback: the device re-runs bumped slider1
    kern.writeback(carry, shadow_v.state)
    assert shadow_v.state.sliders[0] == plug.state.sliders[0]


_MIDI_BLOCK_BODY = """while (midirecv(ofs, m1, m23)) (
  st = m1 & 240;
  st == 144 ? notes += 1;
  st == 128 ? notes -= 1;
  last_vel = (m23 / 256) & 127;
);
"""

_MIDI_EVENTS = [(100, 144, 60, 100), (700, 144, 64, 90), (1800, 128, 60, 0),
                (2600, 144, 67, 70), (4400, 128, 64, 0)]


def _golden_with_midi(prog, x, midi):
    from zorak_tpu.shadow.state import MidiEvent

    plug = compile_shadow(prog)
    plug.state.srate = 48000.0
    apply_slider_state(plug.state, prog, None, None)
    plug.run_init()
    plug.run_slider()
    yg = np.zeros_like(x, dtype=np.float64)
    total = x.shape[1]
    for i in range(0, total, 512):
        n = min(512, total - i)
        st = plug.state
        st.midi_in = [MidiEvent(int(o - i), int(a), int(b), int(c))
                      for (o, a, b, c) in midi if i <= o < i + n]
        st.midi_in_pos = 0
        out = np.zeros((x.shape[0], n), dtype=np.float64)
        plug.process_block(x[:, i:i + n].astype(np.float64), out, x.shape[0])
        yg[:, i:i + n] = out
    return plug, yg


def test_block_midirecv_uncoupled_trajectory():
    """Uncoupled @block midirecv: events route into the host control
    trajectory's per-block queues."""
    src = ("@block\n" + _MIDI_BLOCK_BODY
           + "g = 0.1 + 0.2 * notes + 0.001 * last_vel;\n"
           + "@sample\nenv += 0.01 * (g - env);\nspl0 = spl0 * env;\n")
    prog = compile_plugin_source(src)
    x = noise(1, 5000, seed=23, scale=0.5)
    plug, yg = _golden_with_midi(prog, x, _MIDI_EVENTS)
    shadow_v = make_initialized_shadow(prog, 48000.0)
    kern = specialize_sample_kernel(prog, shadow_v.state, 1,
                                    segment_len=2048)
    assert not kern.coupled and kern.accepts_midi
    y, carry = kern.render(x, midi=_MIDI_EVENTS)
    assert np.abs(y.astype(np.float64) - yg).max() <= 1e-9
    kern.writeback(carry, shadow_v.state)
    assert shadow_v.state.V["notes"] == plug.state.V["notes"]


def test_block_midirecv_coupled_staged_planes():
    """Audio-coupled @block midirecv: host events stage as per-block
    device planes consumed inside the fused scan (ref: JsfxMidiRuntime
    queues consumed in @block, src/JSFXJuceProcessor.cpp:1575+)."""
    src = ("@block\n" + _MIDI_BLOCK_BODY
           + "g = 0.1 + 0.2 * notes + 0.001 * last_vel + acc * 0.0001;\n"
           + "acc = 0;\n"
           + "@sample\nacc += abs(spl0);\nenv += 0.01 * (g - env);\n"
           + "spl0 = spl0 * env;\n")
    prog = compile_plugin_source(src)
    x = noise(1, 5000, seed=24, scale=0.5)
    plug, yg = _golden_with_midi(prog, x, _MIDI_EVENTS)
    shadow_v = make_initialized_shadow(prog, 48000.0)
    kern = specialize_sample_kernel(prog, shadow_v.state, 1,
                                    segment_len=2048)
    assert kern.coupled and kern.accepts_midi
    y, carry = kern.render(x, midi=_MIDI_EVENTS)
    assert np.abs(y.astype(np.float64) - yg).max() <= 1e-9
    kern.writeback(carry, shadow_v.state)
    assert shadow_v.state.V["notes"] == plug.state.V["notes"]


def test_block_midisend_staged_out():
    """Device midisend: events append to the heap-tail OUT table per
    block, decoded to absolute host offsets after the render."""
    src = """@block
acc > thr ? (
  midisend(3, 144, 60 + 256 * 100);
  sent += 1;
);
thr = 5 + sent;
acc = 0;
@sample
acc += abs(spl0);
spl0 = spl0 * 0.5;
"""
    prog = compile_plugin_source(src)
    x = noise(1, 4000, seed=29, scale=0.6)

    from zorak_tpu.shadow.state import MidiEvent  # noqa: F401

    plug = compile_shadow(prog)
    plug.state.srate = 48000.0
    apply_slider_state(plug.state, prog, None, None)
    plug.run_init()
    plug.run_slider()
    golden_out = []
    yg = np.zeros_like(x, dtype=np.float64)
    for i in range(0, 4000, 512):
        n = min(512, 4000 - i)
        st = plug.state
        st.midi_out = []
        out = np.zeros((1, n), dtype=np.float64)
        plug.process_block(x[:, i:i + n].astype(np.float64), out, 1)
        for ev in st.midi_out:
            golden_out.append((i + ev.offset, ev.b1, ev.b2, ev.b3))
        yg[:, i:i + n] = out

    shadow_v = make_initialized_shadow(prog, 48000.0)
    kern = specialize_sample_kernel(prog, shadow_v.state, 1,
                                    segment_len=2048)
    assert kern.coupled and kern._devblock.uses_midi_out
    y, carry = kern.render(x)
    assert np.abs(y.astype(np.float64) - yg).max() <= 1e-9
    assert kern.last_midi_out == golden_out
