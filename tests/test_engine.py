"""Engine host features: oversampling, MIDI streams, smart idle, state."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.runtime.engine import (
    PluginInstance, downsample_box, upsample_linear,
)


class TestResampling:
    def test_upsample_linear_values(self):
        x = np.array([[0.0, 1.0, 2.0]], dtype=np.float32)
        up = upsample_linear(x, 2, prev_tail=np.array([[0.0]], np.float32))
        assert np.allclose(up, [[0.0, 0.0, 0.5, 1.0, 1.5, 2.0]])

    def test_downsample_box(self):
        y = np.array([[1.0, 3.0, 5.0, 7.0]], dtype=np.float32)
        assert np.allclose(downsample_box(y, 2), [[2.0, 6.0]])

    def test_roundtrip_is_near_identity_for_smooth_signal(self):
        t = np.linspace(0, 1, 4800)
        x = np.sin(2 * np.pi * 40 * t)[None, :].astype(np.float32)
        up = upsample_linear(x, 4)
        down = downsample_box(up, 4)
        # the deliberately simple lerp+box chain has ~half-sample lag; for a
        # 40 Hz sine at 4.8 kHz that bounds the error around 2-3%
        assert np.abs(down[:, 8:] - x[:, 8:]).max() < 0.03


class TestOversampledRender:
    def test_engine_rate_visible_to_plugin(self):
        src = "@init\nr = srate;\n@sample\nspl0 = r;\n"
        inst = PluginInstance(compile_plugin_source(src), srate=48000.0,
                              oversample=4, prefer="none")
        x = np.zeros((1, 64), dtype=np.float32)
        res = inst.render(x)
        assert np.allclose(res.audio, 192000.0)

    def test_gain_plugin_oversampled_matches(self):
        src = "@sample\nspl0 *= 0.5;\n"
        x = (np.random.RandomState(0).randn(1, 512) * 0.3).astype(np.float32)
        y1 = PluginInstance(compile_plugin_source(src), prefer="none").render(x).audio
        y4 = PluginInstance(compile_plugin_source(src), prefer="none",
                            oversample=4).render(x).audio
        # memoryless gain: linear-up + box-down shifts content slightly but
        # amplitudes match closely on smooth content; exact on DC
        dc = np.ones((1, 256), dtype=np.float32)
        yd = PluginInstance(compile_plugin_source(src), prefer="none",
                            oversample=4).render(dc).audio
        assert np.allclose(yd[:, 4:], 0.5, atol=1e-6)
        assert y1.shape == y4.shape


class TestMidi:
    SRC = ("@block\n"
           "while (midirecv(ofs, m1, m2, m3)) (\n"
           "  notes += 1; last_note = m2;\n"
           "  midisend(ofs, m1, m2 + 12, m3);\n"
           ");\n"
           "@sample\nspl0 = notes;\n")

    def test_midi_in_out(self):
        inst = PluginInstance(compile_plugin_source(self.SRC), prefer="none")
        x = np.zeros((1, 1024), dtype=np.float32)
        midi = [(100, 0x90, 60, 100), (700, 0x90, 64, 100)]
        res = inst.render(x, block_size=256, midi=midi)
        assert inst.shadow.state.V["notes"] == 2.0
        assert inst.shadow.state.V["last_note"] == 64.0
        out = res.details["midi_out"]
        assert [e[2] for e in out] == [72, 76]
        assert out[0][0] // 256 == 0 and out[1][0] // 256 == 2
        # audio reflects the count after each block
        assert res.audio[0, -1] == 2.0

    def test_midi_kind_plugin_runs(self):
        # midi-effect (no audio IO) should still process blocks
        src = ("@block\nwhile (midirecv(o, a, b, c)) ( midisend(o, a, b, c); );\n")
        inst = PluginInstance(compile_plugin_source(src), prefer="none")
        x = np.zeros((1, 128), dtype=np.float32)
        res = inst.render(x, midi=[(5, 0x80, 60, 0)])
        assert len(res.details["midi_out"]) == 1

    def test_no_sample_catalog_plugin_hosted(self):
        # plugins without @sample (MIDI gesture pads) run on the shadow
        # block loop with full MIDI routing — honest engine hosting
        from zorak_tpu.catalog import discover

        try:
            spec = {s.slug: s for s in
                    discover("/root/reference")}["GesturePad"]
        except Exception:
            pytest.skip("reference catalog unavailable")
        prog = spec.load_program()
        assert prog.plugin_kind == "midi_effect"
        inst = PluginInstance(prog)
        assert inst.engine == "cpu-shadow"
        x = np.zeros((1, 4800), dtype=np.float32)
        res = inst.render(x, midi=[(0, 0x90, 60, 100), (2400, 0x80, 60, 0)])
        assert len(res.details["midi_out"]) >= 1


class TestSmartIdle:
    SRC = "@block\nblocks += 1;\n@sample\nspl0 = spl0 + 0.0;\n"

    def test_sleeps_on_silence_wakes_on_signal(self):
        prog = compile_plugin_source(self.SRC)
        # idle_hold_ms ~ 2 blocks at 256/48k so the 20-block render sleeps
        inst = PluginInstance(prog, prefer="none", smart_idle="input_driven",
                              idle_hold_ms=10.0)
        n = 256 * 20
        x = np.zeros((1, n), dtype=np.float32)
        x[0, 256 * 12] = 0.5  # wake in block 12
        res = inst.render(x, block_size=256)
        blocks_run = inst.shadow.state.V["blocks"]
        assert blocks_run < 20  # slept through part of the silence
        assert res.audio[0, 256 * 12] == 0.5  # awake block passes audio

    def test_always_awake_runs_everything(self):
        prog = compile_plugin_source(self.SRC)
        inst = PluginInstance(prog, prefer="none", smart_idle="always_awake")
        x = np.zeros((1, 256 * 10), dtype=np.float32)
        inst.render(x, block_size=256)
        assert inst.shadow.state.V["blocks"] == 10.0


class TestStatePersistence:
    def test_save_load_roundtrip(self):
        src = ("slider1:5<0,10,1>Gain\n@slider\ng = slider1 * 2;\n"
               "@sample\nspl0 = g;\n")
        prog = compile_plugin_source(src)
        a = PluginInstance(prog, prefer="none", sliders={0: 7.0})
        blob = a.save_state()
        assert blob["sliders"][0] == 7.0

        b = PluginInstance(prog, prefer="none")
        b.load_state(blob)
        x = np.zeros((1, 16), dtype=np.float32)
        y = b.render(x).audio
        assert np.allclose(y, 14.0)


def test_engine_midi_uses_vector_kernel_when_block_recv():
    """MIDI renders stay on the vector engine when @block consumes the
    events (staged planes / trajectory), matching the shadow loop."""
    from zorak_tpu.ir import compile_plugin_source
    from zorak_tpu.runtime.engine import PluginInstance as OfflineEngine

    src = """@block
while (midirecv(ofs, m1, m23)) ( notes += ((m1 & 240) == 144); );
g = 0.2 + 0.1 * notes + acc * 0.0001;
acc = 0;
@sample
acc += abs(spl0);
spl0 = spl0 * g;
"""
    prog = compile_plugin_source(src)
    x = (np.random.RandomState(31).randn(1, 4000) * 0.4).astype(np.float32)
    midi = [(150, 144, 60, 90), (2100, 144, 62, 80)]

    eng_v = OfflineEngine(prog)
    assert eng_v.engine == "tpu-vector"
    rv = eng_v.render(x, midi=midi)

    eng_s = OfflineEngine(prog, prefer="cpu")
    rs = eng_s.render(x, midi=midi)
    assert np.abs(rv.audio.astype(np.float64)
                  - rs.audio.astype(np.float64)).max() <= 1e-9


class TestIdleModes:
    """Smart-idle mode set at reference parity
    (ref: JSFXJuceProcessor.cpp:6147-6392)."""

    SRC = "@block\nblocks += 1;\n@sample\nspl0 = spl0 * 0.5;\n"

    def test_mode_inference_audio_plugin(self):
        inst = PluginInstance(compile_plugin_source(self.SRC), prefer="none")
        assert inst.effective_idle_mode == "input_driven"

    def test_mode_inference_midi_effect(self):
        src = "@block\nwhile (midirecv(o, a, b, c)) ( q += 1; );\n"
        inst = PluginInstance(compile_plugin_source(src), prefer="none")
        assert inst.effective_idle_mode == "event_driven"

    def test_free_running_never_sleeps(self):
        inst = PluginInstance(compile_plugin_source(self.SRC), prefer="none",
                              smart_idle="free_running", idle_hold_ms=1.0)
        x = np.zeros((1, 256 * 12), dtype=np.float32)
        inst.render(x, block_size=256)
        assert inst.shadow.state.V["blocks"] == 12.0

    def test_keep_awake_var_blocks_sleep(self):
        src = "@init\nza_keep_awake = 1;\n" + self.SRC
        inst = PluginInstance(compile_plugin_source(src), prefer="none",
                              smart_idle="input_driven", idle_hold_ms=1.0)
        x = np.zeros((1, 256 * 12), dtype=np.float32)
        inst.render(x, block_size=256)
        assert inst.shadow.state.V["blocks"] == 12.0

    def test_output_tail_defers_sleep(self):
        # decaying feedback keeps output hot after input silence: the
        # quiet window must not start until the tail decays (ref: :3742)
        src = ("@block\nblocks += 1;\n"
               "@sample\nz = 0.999*z + spl0;\nspl0 = z;\n")
        inst = PluginInstance(compile_plugin_source(src), prefer="none",
                              smart_idle="input_driven", idle_hold_ms=5.0,
                              idle_threshold=1e-4)
        n = 256 * 30
        x = np.zeros((1, n), dtype=np.float32)
        x[0, :256] = 0.5  # one loud block, then silence with a long tail
        inst.render(x, block_size=256)
        assert inst.shadow.state.V["blocks"] > 10.0

    def test_vector_gated_matches_always_awake_on_active_audio(self):
        # fully active input: the gated vector path must be bit-identical
        # to the ungated render (every block awake)
        prog = compile_plugin_source(self.SRC)
        x = (np.random.RandomState(0).randn(1, 4096) * 0.4).astype(np.float32)
        a = PluginInstance(prog, smart_idle="always_awake")
        b = PluginInstance(prog, smart_idle="input_driven")
        if a.kernel is None:
            pytest.skip("vector kernel unavailable")
        ya = a.render(x).audio
        rb = b.render(x)
        assert rb.details.get("idle_mode") == "input_driven"
        assert np.array_equal(ya, rb.audio)

    def test_vector_gated_sleeps_and_freezes_block_state(self):
        prog = compile_plugin_source(self.SRC)
        inst = PluginInstance(prog, smart_idle="input_driven",
                              idle_hold_ms=10.0)
        if inst.kernel is None:
            pytest.skip("vector kernel unavailable")
        n = 512 * 40
        x = np.zeros((1, n), dtype=np.float32)
        x[0, 512 * 30 + 5] = 0.5
        res = inst.render(x)
        assert res.details["awake_blocks"] < res.details["blocks"]
        # @block only ran for awake blocks
        assert inst.shadow.state.V["blocks"] == res.details["awake_blocks"]


class TestFilePersistence:
    def test_save_restores_file_slots_and_recents(self, tmp_path):
        from zorak_tpu.runtime import wavio
        from zorak_tpu.runtime.services import EngineHost

        wav = tmp_path / "probe.wav"
        wavio.write_wav(wav, np.zeros((1, 256), np.float32), 48000)
        src = "@sample\nspl0 *= 0.5;\n"
        inst = PluginInstance(compile_plugin_source(src), prefer="none",
                              host=EngineHost())
        inst.load_file(0, wav)
        inst.import_recipes.append('{"action": 1}')
        blob = inst.save_state()
        assert blob["files"][0]["paths"] == [str(wav)]
        assert blob["recent_files"] == [str(wav)]
        assert blob["import_recipes"] == ['{"action": 1}']

        inst2 = PluginInstance(compile_plugin_source(src), prefer="none",
                               host=EngineHost())
        inst2.load_state(blob)
        svc = inst2.shadow.state.host.files
        assert [e.path for e in svc.slots[0]] == [str(wav)]
        assert inst2.recent_files == [str(wav)]
        assert inst2.import_recipes == ['{"action": 1}']


class TestMonitorModes:
    """Correctness-monitor output selection (ref JSFXCorrectnessCheck.h:1042:
    the monitor renders Compiled, Shadow, or the Delta null signal)."""

    FILT = ("@init\nz = 0;\n@sample\n"
            "z = 0.99 * z + 0.01 * spl0; spl0 = z;\n")

    def _x(self, n=2048):
        return (np.random.RandomState(7).randn(1, n) * 0.3).astype(np.float32)

    def test_delta_near_null_on_vector_engine(self):
        inst = PluginInstance(compile_plugin_source(self.FILT))
        assert inst.kernel is not None
        res = inst.render(self._x(), monitor="delta")
        assert res.details["monitor"] == "delta"
        assert np.max(np.abs(res.audio)) < 1e-5
        assert res.details["max_delta"] < 1e-5

    def test_shadow_output_matches_pure_shadow_render(self):
        x = self._x()
        prog = compile_plugin_source(self.FILT)
        mon = PluginInstance(prog).render(x, monitor="shadow")
        pure = PluginInstance(prog, prefer="none").render(x)
        assert np.allclose(mon.audio, pure.audio, atol=1e-6)

    def test_state_follows_compiled_path(self):
        x = self._x()
        prog = compile_plugin_source(self.FILT)
        inst = PluginInstance(prog)
        inst.render(x, monitor="delta")
        z_mon = float(inst.shadow.state.V["z"])
        inst2 = PluginInstance(prog)
        inst2.render(x)
        assert z_mon == pytest.approx(float(inst2.shadow.state.V["z"]),
                                      abs=1e-12)

    def test_shadow_engine_delta_is_exact_zero(self):
        inst = PluginInstance(compile_plugin_source(self.FILT),
                              prefer="none")
        res = inst.render(self._x(), monitor="delta")
        assert np.all(res.audio == 0.0)
        assert res.details["max_delta"] == 0.0

    def test_bad_mode_rejected(self):
        inst = PluginInstance(compile_plugin_source(self.FILT),
                              prefer="none")
        with pytest.raises(ValueError):
            inst.render(self._x(256), monitor="diff")
