"""Hop pipeline: FFT/device work fired every N samples from inside
@sample (the partitioned-convolution shape, ref:
PsychoConvolver.jsfx:355-420,801-874), extracted as a device section and
fused between vectorized sample segments; plus the settle-bake regime for
@block heaps that reach a fixpoint after the first block."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.runtime.services import EngineHost
from zorak_tpu.shadow import compile_shadow
from zorak_tpu.verify import make_initialized_shadow
from zorak_tpu.verify.nulltest import apply_slider_state, compare_audio


def golden_render(prog, x, host=None, block=512):
    gold = compile_shadow(prog, host=host)
    gold.state.srate = 48000.0
    apply_slider_state(gold.state, prog, None)
    gold.run_init()
    gold.run_slider()
    nch, total = x.shape
    y = np.zeros_like(x, dtype=np.float64)
    for s in range(0, total, block):
        e = min(s + block, total)
        out = np.zeros((nch, e - s), dtype=np.float64)
        gold.process_block(x[:, s:e].astype(np.float64), out, nch)
        y[:, s:e] = out
    return y


HOP_SRC = """@init
H = 64;
INBUF = 0;
OUTBUF = 256;
ctr = 0;
rpos = 0;
function do_hop() local(i) (
  i = 0;
  while (i < H) (
    OUTBUF[i] = INBUF[i] * 0.5 + 0.1;
    i += 1;
  );
  hops += 1;
);
@sample
y = OUTBUF[rpos];
INBUF[ctr] = spl0;
spl0 = y + spl0 * 0.25;
rpos += 1;
rpos >= H ? rpos = 0;
ctr += 1;
ctr >= H ? (
  do_hop();
  ctr = 0;
);
"""


class TestHopPipeline:
    def test_synthetic_hop_null(self):
        prog = compile_plugin_source(HOP_SRC)
        x = (np.random.RandomState(3).randn(1, 1000) * 0.4).astype(np.float32)
        y_ref = golden_render(prog, x, block=32)
        sh = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, sh.state, 1, segment_len=512,
                                        block_size=32)
        assert kern._hop is not None
        y, carry = kern.render(x)
        assert np.abs(y.astype(np.float64) - y_ref).max() == 0.0
        # state parity including the hop's own counter
        st = sh.state
        kern.writeback(carry, st)
        assert st.V["hops"] == float(1000 // 64)

    def test_hop_streaming_resume(self):
        prog = compile_plugin_source(HOP_SRC)
        x = (np.random.RandomState(5).randn(1, 700) * 0.4).astype(np.float32)
        y_ref = golden_render(prog, x, block=32)
        sh = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, sh.state, 1, segment_len=512,
                                        block_size=32)
        y1, carry = kern.render(x[:, :300])   # mid-hop split (300 % 64 != 0)
        y2, carry = kern.render(x[:, 300:], carry)
        y = np.concatenate([y1, y2], axis=1)
        assert np.abs(y.astype(np.float64) - y_ref).max() == 0.0


def _psycho(reference_plugins):
    from zorak_tpu.ir import load_plugin_file

    return load_plugin_file(
        reference_plugins
        / "Spatialization/PsychoConvolver/src/PsychoConvolver.jsfx")


def _ir_host():
    host = EngineHost()
    rng = np.random.RandomState(4)
    ir = np.zeros((2, 3000))
    ir[:, 0] = 1.0
    ir[0, 1200] = 0.5
    ir[1, 700] = -0.3
    ir += rng.randn(2, 3000) * 0.01
    host.files.load_slot(0, ir, srate=48000.0)
    return host


class TestPsychoConvolver:
    def test_null_with_ir(self, reference_plugins):
        prog = _psycho(reference_plugins)
        x = (np.random.RandomState(17).randn(2, 9000) * 0.3
             ).astype(np.float32)
        y_ref = golden_render(prog, x, host=_ir_host())
        sh = make_initialized_shadow(prog, 48000.0, host=_ir_host())
        kern = specialize_sample_kernel(prog, sh.state, 2, segment_len=4096)
        assert kern._hop is not None and kern._block_settled
        y, _ = kern.render(x)
        rep = compare_audio(y_ref.astype(np.float32), y)
        assert rep.audio_passed, rep.summary()

    def test_no_ir_is_passthroughish(self, reference_plugins):
        # empty slot: ir_ready stays 0, the hop folds dead, and the render
        # must still match the golden passthrough path
        prog = _psycho(reference_plugins)
        x = (np.random.RandomState(9).randn(2, 4000) * 0.3
             ).astype(np.float32)
        host1, host2 = EngineHost(), EngineHost()
        y_ref = golden_render(prog, x, host=host1)
        sh = make_initialized_shadow(prog, 48000.0, host=host2)
        try:
            kern = specialize_sample_kernel(prog, sh.state, 2,
                                            segment_len=2048)
        except SpecializeError as exc:
            pytest.skip(f"no-IR path not vectorizable: {exc}")
        y, _ = kern.render(x)
        rep = compare_audio(y_ref.astype(np.float32), y)
        assert rep.audio_passed, rep.summary()


class TestHopCrossFeatures:
    def test_hop_with_gated_rand(self):
        # gated rand draws + a hop section in one kernel: the flat pool
        # indexing must survive the hop-pipeline segmentation
        src = """@init
H = 32;
BUF = 0;
OUT = 64;
ctr = 0;
rp = 0;
function work() local(i) (
  i = 0;
  while (i < H) ( OUT[i] = BUF[i] * 0.25; i += 1; );
);
@sample
y = OUT[rp];
BUF[ctr] = spl0;
spl0 > 0.5 ? ( nz = rand(1) * 0.01; ) : ( nz = 0; );
spl0 = y + nz;
rp += 1;
rp >= H ? rp = 0;
ctr += 1;
ctr >= H ? ( work(); ctr = 0; );
"""
        from zorak_tpu.ir import compile_plugin_source

        prog = compile_plugin_source(src)
        x = (np.random.RandomState(41).randn(1, 800) * 0.6
             ).astype(np.float32)
        y_ref = golden_render(prog, x, block=32)
        sh = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, sh.state, 1, segment_len=256,
                                        block_size=32)
        assert kern._hop is not None and kern.rand_gated
        y, _ = kern.render(x)
        assert np.abs(y.astype(np.float64) - y_ref).max() <= 1e-9

    def test_hop_reads_multiwriter_ring(self):
        # two writers share the staged input ring; the hop consumes it
        src = """@init
H = 16;
BUF = 0;
OUT = 32;
ctr = 0;
rp = 0;
function put(x) instance(dummy) ( BUF[ctr] = x; );
function work() local(i) (
  i = 0;
  while (i < H) ( OUT[i] = BUF[i] * 0.5; i += 1; );
);
@sample
y = OUT[rp];
a.put(spl0 * 2);
b.put(spl0);
spl0 = y;
rp += 1;
rp >= H ? rp = 0;
ctr += 1;
ctr >= H ? ( work(); ctr = 0; );
"""
        from zorak_tpu.ir import compile_plugin_source

        prog = compile_plugin_source(src)
        x = (np.random.RandomState(43).randn(1, 400) * 0.4
             ).astype(np.float32)
        y_ref = golden_render(prog, x, block=16)
        sh = make_initialized_shadow(prog)
        kern = specialize_sample_kernel(prog, sh.state, 1, segment_len=128,
                                        block_size=16)
        y, _ = kern.render(x)
        assert np.abs(y.astype(np.float64) - y_ref).max() == 0.0
