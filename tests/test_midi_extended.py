"""Variable-length MIDI builtins (midirecv_buf/_str, midisend_buf/_str,
midisyx): semantics per the reference host shims
(ref: src/JSFXJuceProcessor.cpp:2280-2433, helpers :1505-1822), and
bit-parity between the two golden executors."""
import numpy as np

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.shadow import compile_native_shadow, compile_shadow
from zorak_tpu.shadow.state import MidiEvent, midi_short_length
from zorak_tpu.verify import apply_slider_state


def both(src, srate=48000.0):
    prog = compile_plugin_source(src)
    out = []
    for mk in (compile_shadow, compile_native_shadow):
        p = mk(prog)
        p.state.srate = srate
        apply_slider_state(p.state, prog)
        p.run_init()
        p.run_slider()
        out.append(p)
    return prog, out[0], out[1]


def run_block(p, midi, n=256, nch=2):
    p.state.midi_in = list(midi)
    p.state.midi_in_pos = 0
    p.state.midi_out = []
    x = np.zeros((nch, n), np.float32)
    y = np.zeros((nch, n), np.float32)
    p.process_block(x, y)
    return p.state.midi_out


def out_payloads(events):
    return [(e.offset, e.payload()) for e in events]


def test_short_length_table():
    # ref jsfxShortMessageLength: JUCE lengths floored at 1, capped at 3
    assert midi_short_length(0x90) == 3
    assert midi_short_length(0xB3) == 3
    assert midi_short_length(0xC5) == 2
    assert midi_short_length(0xD0) == 2
    assert midi_short_length(0xE1) == 3
    assert midi_short_length(0xF1) == 2
    assert midi_short_length(0xF2) == 3
    assert midi_short_length(0xF3) == 2
    assert midi_short_length(0xF8) == 1
    assert midi_short_length(0x40) == 1   # no status bit


RECV_SEND_BUF = """\
@init
buf = 64;
gotlen = 0; sent = 0;
@block
while ((l = midirecv_buf(ofs, buf, 3)) > 0) (
  gotlen += l;
  sent += midisend_buf(ofs + 1, buf, l);
);
"""


def test_recv_buf_send_buf_roundtrip_and_parity():
    prog, py, nat = both(RECV_SEND_BUF)
    midi = [MidiEvent(10, 0x90, 60, 100), MidiEvent(20, 0xC2, 7, 0)]
    outs = []
    for p in (py, nat):
        ev = run_block(p, midi)
        outs.append(out_payloads(ev))
        # note-on: 3 bytes; program change: 2 bytes, offsets shifted +1
        assert outs[-1] == [(11, (0x90, 60, 100)), (21, (0xC2, 7))]
        assert p.state.V["gotlen"] == 5.0
        assert p.state.V["sent"] == 5.0
        # bytes landed in mem[64..]
        assert list(p.state.mem[64:67]) == [0xC2, 7.0, 100.0]
    assert outs[0] == outs[1]
    for name in ("gotlen", "sent"):
        assert py.state.V[name] == nat.state.V[name]


def test_recv_buf_passthrough_when_too_long():
    # maxlen=2: the 3-byte note-on passes through to the OUTPUT queue
    src = RECV_SEND_BUF.replace("midirecv_buf(ofs, buf, 3)",
                                "midirecv_buf(ofs, buf, 2)")
    prog, py, nat = both(src)
    midi = [MidiEvent(10, 0x90, 60, 100), MidiEvent(20, 0xC2, 7, 0)]
    for p in (py, nat):
        ev = run_block(p, midi)
        # passthrough keeps the ORIGINAL offset; the 2-byte message is
        # consumed and re-sent at ofs+1
        assert out_payloads(ev) == [(10, (0x90, 60, 100)), (21, (0xC2, 7))]
        assert p.state.V["gotlen"] == 2.0


def test_send_buf_sysex_framing_and_bounds():
    src = """\
@init
p = 32; p[0] = 65; p[1] = 16; p[2] = 66; p[3] = 18;
n_syx = midisyx(5, p, 4);
n_far = midisend_buf(5, 100000000, 8);
"""
    prog, py, nat = both(src)
    for p in (py, nat):
        assert p.state.V["n_syx"] == 6.0     # F0 + 4 + F7
        assert p.state.V["n_far"] == 0.0     # read past heap: refused
        (ev,) = p.state.midi_out
        assert ev.payload() == (0xF0, 65, 16, 66, 18, 0xF7)
        assert ev.offset == 0                # clamped: no block yet


def test_send_buf_autodetects_sysex():
    # 3 bytes already F0-framed: F0 x F7 stays as-is (no double framing)
    src = """\
@init
p = 8; p[0] = 240; p[1] = 9; p[2] = 247;
n = midisend_buf(0, p, 3);
"""
    prog, py, nat = both(src)
    for p in (py, nat):
        assert p.state.V["n"] == 3.0
        assert p.state.midi_out[0].payload() == (0xF0, 9, 0xF7)


RECV_STR = """\
@init
gotlen = 0;
sent = 0;
@block
while ((l = midirecv_str(ofs, #m)) > 0) (
  gotlen += l;
  sent += midisend_str(ofs + 2, #m);
);
"""


def test_recv_str_send_str_roundtrip_and_parity():
    prog, py, nat = both(RECV_STR)
    midi = [MidiEvent(3, 0x80, 61, 0)]
    outs = []
    for p in (py, nat):
        ev = run_block(p, midi)
        outs.append(out_payloads(ev))
        assert p.state.V["gotlen"] == 3.0
        assert p.state.V["sent"] == 3.0
        assert outs[-1] == [(5, (0x80, 61, 0))]
    assert outs[0] == outs[1]


def test_long_event_roundtrips_through_recv_buf():
    # a sysex INPUT event (data beyond b1..b3) is readable via recv_buf
    src = """\
@init
buf = 16; n = 0;
@block
n = midirecv_buf(ofs, buf, 16);
"""
    prog, py, nat = both(src)
    syx = MidiEvent(7, 0xF0, 1, 2, data=(0xF0, 1, 2, 3, 0xF7))
    for p in (py, nat):
        run_block(p, [syx])
        assert p.state.V["n"] == 5.0
        assert list(p.state.mem[16:21]) == [0xF0, 1.0, 2.0, 3.0, 0xF7]


# -- vector-path payload propagation ------------------------------------------

SYSEX_FROM_BLOCK = """\
@init
p = 32; p[0] = 65; p[1] = 16; p[2] = 99;
cnt = 0;
@block
cnt += 1;
cnt == 2 ? midisyx(5, p, 3);
@sample
spl0 = spl0 * 0.5;
spl1 = spl1 * 0.5;
"""


def test_vector_trajectory_carries_sysex_payload():
    """@block midisyx on the host-trajectory vector path must surface the
    FULL byte string, not an (offset,b1,b2,b3) truncation (the null
    harness now compares payloads end-to-end)."""
    from zorak_tpu.lowering import specialize_sample_kernel
    from zorak_tpu.verify import make_initialized_shadow, null_test_plugin

    prog = compile_plugin_source(SYSEX_FROM_BLOCK)
    rng = np.random.RandomState(3)
    x = (rng.randn(2, 2048) * 0.25).astype(np.float32)
    rep = null_test_plugin(prog, x, block_size=512, segment_len=1024)
    assert rep.passed, rep.describe()

    snap = make_initialized_shadow(prog, 48000.0)
    kern = specialize_sample_kernel(prog, snap.state, 2,
                                    segment_len=1024, block_size=512)
    kern.render(x)
    (ev,) = kern.last_midi_out
    assert ev[:4] == (512 + 5, 0xF0, 65, 16)
    assert ev[4] == (0xF0, 65, 16, 99, 0xF7)


def test_compare_midi_out_catches_payload_truncation():
    from zorak_tpu.verify.nulltest import compare_midi_out

    full = [(5, 0xF0, 65, 16, (0xF0, 65, 16, 99, 0xF7))]
    truncated = [(5, 0xF0, 65, 16)]
    assert compare_midi_out(full, list(full)).midi_mismatch is None
    assert compare_midi_out(full, truncated).midi_mismatch is not None


def test_midi_round_half_away_from_zero():
    from zorak_tpu.shadow.pyexec import _midi_round

    assert _midi_round(-1.5) == -2     # llround, not floor(v+0.5)
    assert _midi_round(1.5) == 2
    assert _midi_round(-0.5) == -1
    assert _midi_round(2.4) == 2
    assert _midi_round(-2.6) == -3
