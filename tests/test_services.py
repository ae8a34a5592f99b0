"""File slots + sample pool services, driven through real JSFX scripts
(including the reference's sample_pool_probe)."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.runtime.services import EngineHost
from zorak_tpu.shadow import compile_native_shadow, compile_shadow
from zorak_tpu.verify import apply_slider_state


def make_plugin(src_or_prog, host=None, native=False):
    prog = (src_or_prog if not isinstance(src_or_prog, str)
            else compile_plugin_source(src_or_prog))
    host = host or EngineHost()
    p = (compile_native_shadow if native else compile_shadow)(prog, host=host)
    p.state.srate = 48000.0
    apply_slider_state(p.state, prog)
    return prog, p, host


def ramp_audio(ch=2, n=1000):
    t = np.arange(n, dtype=np.float64)
    return np.stack([0.001 * t + c for c in range(ch)])


class TestFileSlots:
    SRC = """\
filename:0,test.wav
@init
h = file_open(0);
ok = h >= 0;
file_riff(h, nch, fsr);
avail0 = file_avail(h);
file_var(h, v0);
file_var(h, v1);
buf = 1000;
got = file_mem(h, buf, 6);
avail1 = file_avail(h);
file_rewind(h);
file_var(h, r0);
file_close(h);
"""

    def test_cursor_api(self):
        host = EngineHost()
        host.files.load_slot(0, ramp_audio(2, 100), srate=44100.0)
        _, p, _ = make_plugin(self.SRC, host=host)
        p.run_init()
        V = p.state.V
        assert V["ok"] == 1.0
        assert V["nch"] == 2.0 and V["fsr"] == 44100.0
        assert V["avail0"] == 200.0
        # interleaved: frame0 = (0.0, 1.0)
        assert V["v0"] == 0.0 and V["v1"] == 1.0
        assert V["got"] == 6.0
        assert p.state.mem[1000] == 0.001 + 0.0   # frame1 ch0
        assert p.state.mem[1001] == 0.001 + 1.0   # frame1 ch1
        assert V["avail1"] == 200.0 - 2 - 6
        assert V["r0"] == 0.0

    def test_missing_slot(self):
        _, p, _ = make_plugin("@init\nh = file_open(3);\nok = h >= 0;\n")
        p.run_init()
        assert p.state.V["ok"] == 0.0

    def test_native_parity(self):
        host_a = EngineHost()
        host_b = EngineHost()
        for h in (host_a, host_b):
            h.files.load_slot(0, ramp_audio(2, 100), srate=44100.0)
        _, a, _ = make_plugin(self.SRC, host=host_a)
        _, b, _ = make_plugin(self.SRC, host=host_b, native=True)
        a.run_init()
        b.run_init()
        for name in ("ok", "nch", "fsr", "avail0", "v0", "v1", "got", "avail1", "r0"):
            assert a.state.V[name] == b.state.V[name], name


class TestSamplePool:
    def test_reference_probe(self, reference_root):
        prog = load_plugin_file(
            reference_root / "tests/dsp-jsfx-sample-pool/sample_pool_probe.jsfx")
        host = EngineHost()
        audio = ramp_audio(2, 300)
        host.files.load_slot(0, audio, srate=48000.0, name="probe.wav")
        p = compile_shadow(prog, host=host)
        p.state.srate = 48000.0
        apply_slider_state(p.state, prog)
        p.run_init()
        p.run_slider()
        n = 128
        x = np.zeros((2, n), dtype=np.float32)
        y = np.zeros_like(x)
        p.process_block(x, y)
        V = p.state.V
        assert V["state"] == 3.0      # READY
        assert V["selected"] == 1.0 and V["loaded"] == 1.0
        assert V["id"] == 1.0
        assert V["frames"] == 300.0 and V["chans"] == 2.0
        # the @sample loop read frames sequentially into last_l/last_r
        assert V["phase"] == float(n)
        assert abs(V["last_l"] - np.float32(audio[0, n - 1])) < 1e-6
        assert np.all(np.isfinite(y))
        assert abs(y[0, -1] - np.float32(V["last_l"] * 0.1)) < 1e-6

    def test_read_semantics(self):
        src = """\
@init
pool = sample_pool_from_slot(0, "p");
id = sample_get(pool, 0);
a = sample_read(pool, id, 0, 2);
b = sample_read(pool, id, 1, 2);
c = sample_read(pool, id, 0, 2.6);
d = sample_read_interp(pool, id, 0, 2.5);
oob = sample_read(pool, id, 0, 999);
clamp_ch = sample_read(pool, id, 7, 2);
ok2 = sample_read2(pool, id, 2, l2, r2);
bad2 = sample_read2(pool, id, 400, bl, br);
ln = sample_len(pool, id);
pk = sample_peak(pool, id);
"""
        host = EngineHost()
        audio = ramp_audio(2, 10)
        host.files.load_slot(0, audio, srate=48000.0)
        _, p, _ = make_plugin(src, host=host)
        p.run_init()
        V = p.state.V
        a32 = audio.astype(np.float32)
        assert V["a"] == float(a32[0, 2])
        assert V["b"] == float(a32[1, 2])
        assert V["c"] == float(a32[0, 3])  # llround(2.6) = 3
        expect = a32[0, 2] + (a32[0, 3] - a32[0, 2]) * 0.5
        assert abs(V["d"] - expect) < 1e-12
        assert V["oob"] == 0.0
        assert V["clamp_ch"] == float(a32[1, 2])
        assert V["ok2"] == 1.0 and V["l2"] == float(a32[0, 2]) \
            and V["r2"] == float(a32[1, 2])
        assert V["bad2"] == 0.0 and V["bl"] == 0.0 and V["br"] == 0.0
        assert V["ln"] == 10.0
        assert V["pk"] == float(np.abs(a32).max())

    def test_export_mem_block_only_and_preview(self):
        src = """\
@init
pool = sample_pool_from_slot(0, "p");
id = sample_get(pool, 0);
bins = sample_preview_bins(pool, id);
pv = sample_preview_read(pool, id, 0, mn, mx, rm);
@block
n = sample_export_mem(pool, id, 5000, 0, 8);
s = mem[5000] + mem[5007];
"""
        host = EngineHost()
        audio = ramp_audio(1, 64)
        host.files.load_slot(0, audio, srate=48000.0)
        _, p, _ = make_plugin(src, host=host)
        p.run_init()
        p.run_block()
        V = p.state.V
        # proportional bins, <=256 per sample (ref DspJsfxSamplePool.cpp:115)
        assert V["bins"] == 64.0
        assert V["pv"] == 1.0 and V["mx"] >= V["mn"]
        assert V["n"] == 8.0
        a32 = audio.astype(np.float32)
        assert abs(V["s"] - (float(a32[0, 0]) + float(a32[0, 7]))) < 1e-12

    def test_native_parity_probe(self, reference_root):
        prog = load_plugin_file(
            reference_root / "tests/dsp-jsfx-sample-pool/sample_pool_probe.jsfx")
        outs = []
        for native in (False, True):
            host = EngineHost()
            host.files.load_slot(0, ramp_audio(2, 200), srate=48000.0)
            p = (compile_native_shadow if native else compile_shadow)(
                prog, host=host)
            p.state.srate = 48000.0
            apply_slider_state(p.state, prog)
            p.run_init()
            p.run_slider()
            x = np.zeros((2, 96), dtype=np.float32)
            y = np.zeros_like(x)
            p.process_block(x, y)
            outs.append((y.copy(), dict(p.state.V)))
        ya, va = outs[0]
        yb, vb = outs[1]
        assert np.array_equal(ya, yb)
        for k, v in va.items():
            assert v == vb[k] or (v != v and vb[k] != vb[k]), k


class TestSamplePoolSemantics:
    """Budget/mode/resample/async semantics (ref DspJsfxSamplePool.cpp:
    165-195 setMode/setBudgetMB, 473-750 buildGeneration, 753-800
    publishGeneration)."""

    SRC = """\
@init
sample_pool_set_mode(0, MODE);
sample_pool_set_budget_mb(0, BUDGET);
pool = sample_pool_from_slot(0, "p");
st = sample_pool_state(pool);
sel = sample_pool_selected(pool);
ld = sample_pool_loaded(pool);
fl = sample_pool_failed(pool);
id0 = sample_get(pool, 0);
id1 = sample_get(pool, 1);
ln0 = sample_len(pool, id0);
"""

    def _run(self, mode, budget_mb, n_files=3, frames=100000, srate=48000.0):
        host = EngineHost()
        for _ in range(n_files):
            host.files.load_slot(0, ramp_audio(2, frames), srate=srate)
        src = self.SRC.replace("MODE", str(mode)).replace(
            "BUDGET", str(budget_mb))
        _, p, _ = make_plugin(src, host=host)
        p.run_init()
        return p.state.V, host

    def test_resident_ignores_budget(self):
        # mode 0 loads everything regardless of budget (ref :499)
        V, _ = self._run(mode=0, budget_mb=0.1)
        assert V["st"] == 3.0 and V["ld"] == 3.0 and V["fl"] == 0.0

    def test_budgeted_skips_past_budget(self):
        # 100k frames x 2ch x 4B = 0.76 MB each; 1 MB budget keeps ONE
        V, _ = self._run(mode=1, budget_mb=1.0)
        assert V["sel"] == 3.0
        assert V["ld"] == 1.0 and V["fl"] == 2.0
        assert V["st"] == 4.0          # PARTIAL
        # kept entries get the ids (1..kept), skipped ones consume none
        assert V["id0"] == 1.0 and V["id1"] == 0.0

    def test_budget_all_skipped_is_failed_state(self):
        V, _ = self._run(mode=1, budget_mb=0.1)
        assert V["ld"] == 0.0 and V["st"] == 5.0   # FAILED

    def test_zero_budget_disables_budgeting(self):
        V, _ = self._run(mode=1, budget_mb=0.0)
        assert V["ld"] == 3.0 and V["st"] == 3.0

    def test_resample_to_engine_rate(self):
        # 44.1k source into a 48k engine: frames scale by 48/44.1
        V, _ = self._run(mode=0, budget_mb=0.0, n_files=1, frames=44100,
                         srate=44100.0)
        assert V["ln0"] == 48000.0
        # and the resampled audio interpolates the ramp linearly
        host = EngineHost()
        host.files.load_slot(0, ramp_audio(1, 44100), srate=44100.0)
        src = self.SRC.replace("MODE", "0").replace("BUDGET", "0") + \
            "v = sample_read(pool, id0, 0, 4800);\n"
        _, p, _ = make_plugin(src, host=host)
        p.run_init()
        # dst frame 4800 samples srcPos = 4800 * 44100/48000 = 4410
        a32 = ramp_audio(1, 44100).astype(np.float32)
        assert abs(p.state.V["v"] - float(a32[0, 4410])) < 1e-6

    def test_small_rate_delta_keeps_native(self):
        V, _ = self._run(mode=0, budget_mb=0.0, n_files=1, frames=1000,
                         srate=48000.5)   # delta <= 1 Hz: no resample
        assert V["ln0"] == 1000.0

    def test_async_commit_publishes(self):
        host = EngineHost()
        host.files.load_slot(0, ramp_audio(2, 5000), srate=48000.0)
        host.pool.async_commits = True
        host.pool.set_target_srate(48000.0)
        host.pool.commit_sources(host.files.slots.get(0, []))
        state = host.pool.wait_ready(timeout=30.0)
        assert state == 3.0
        assert host.pool.generation is not None
        assert len(host.pool.generation.entries) == 1
