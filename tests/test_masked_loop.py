"""Data-dependent loop(n) in @sample: masked bounded unroll.

The vectorizer's last big rejection class with a known plan (round-4
verdict #4; the idiom is Texture.jsfx's event-bounds expansion scans,
ref Texture.jsfx:3411-3447).  K static iterations each gated by
(n >= i+1) through the branch-merge machinery are bit-equivalent to the
golden's sequential trunc(n)-trip loop.  K comes from a static interval
bound on n when one exists; otherwise a guess rides a carried runtime
overflow monitor and the kernel rebuilds with a doubled K when a
render's realized n exceeds it (render_device ladder).
"""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin


def noise(ch, n, scale=0.4, seed=9):
    return (np.random.RandomState(seed).randn(ch, n) * scale).astype(
        np.float32)


class TestMaskedLoop:
    def test_clamped_count_static_bound(self):
        # n is audio-dependent but clamped: the interval machinery gives
        # a finite K, no runtime guard needed
        src = ("@sample\n"
               "n = abs(spl0) * 10;\n"
               "n > 6 ? n = 6;\n"
               "acc = 0; i = 0;\n"
               "loop(n,\n"
               "  acc += spl0 * (i + 1);\n"
               "  i += 1;\n"
               ");\n"
               "spl0 = acc * 0.1;\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog, 48000.0)
        kern = specialize_sample_kernel(prog, shadow.state, 1,
                                        segment_len=1024)
        assert not kern.sym.masked_loops, "clamped n needs no guard"
        rep = null_test_plugin(prog, noise(1, 4000), segment_len=1024)
        assert rep.passed, rep.summary()

    def test_loop_value_and_state(self):
        src = ("@init\nhist = 100;\n"
               "@sample\n"
               "n = abs(spl0) * 8;\n"
               "n > 5 ? n = 5;\n"
               "s = 0;\n"
               "v = loop(n, s += 1; s * 2;);\n"
               "hist[0] = v;\n"
               "spl0 = v * 0.05 + hist[0] * 0.01;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_expansion_scan_shape(self):
        # the Texture compute_event_bounds shape: loop-carried cursor +
        # continue flag, early-exit expressed through the flag
        src = ("@init\ntab = 200;\n"
               "i = 0; loop(64, tab[i] = sin(i * 0.37); i += 1;);\n"
               "@sample\n"
               "n = abs(spl0) * 12;\n"
               "n > 8 ? n = 8;\n"
               "left = 32; cont = 1;\n"
               "loop(n,\n"
               "  cont ? (\n"
               "    left > 0 ? (\n"
               "      tab[left - 1] > 0 ? left -= 1 : cont = 0;\n"
               "    ) : cont = 0;\n"
               "  );\n"
               ");\n"
               "spl0 = left * 0.01 + tab[left] * 0.2;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_unbounded_count_overflow_ladder(self):
        # ctrl-derived n with no static bound: a deliberately tiny guess
        # forces the overflow monitor to fire and the kernel to rebuild
        # with a doubled K mid-render, replaying bit-exactly
        src = ("@block\n"
               "blk += 1;\n"
               "reps = blk;\n"          # grows 1, 2, 3, ... per block
               "@sample\n"
               "acc = 0; i = 0;\n"
               "loop(reps,\n"
               "  acc += spl0 * 0.25 + i * 0.001;\n"
               "  i += 1;\n"
               ");\n"
               "spl0 = acc * 0.2;\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog, 48000.0)
        kern = specialize_sample_kernel(prog, shadow.state, 1,
                                        segment_len=512, block_size=128,
                                        masked_loop_k=2)
        assert kern.sym.masked_loops, "unbounded n must register a guard"
        x = noise(1, 1024)   # 8 blocks -> reps reaches 8 > K=2
        y, carry = kern.render(x)
        assert kern.masked_loop_k >= 8, \
            f"ladder should have doubled past 8, got {kern.masked_loop_k}"
        # golden comparison
        from zorak_tpu.shadow import compile_native_shadow
        from zorak_tpu.verify.nulltest import (apply_slider_state,
                                               compare_audio)

        gold = compile_native_shadow(prog)
        gold.state.srate = 48000.0
        apply_slider_state(gold.state, prog, None)
        gold.run_init()
        gold.run_slider()
        y_ref = np.zeros_like(x)
        for s in range(0, x.shape[1], 128):
            e = min(s + 128, x.shape[1])
            gold.process_block(x[:, s:e], y_ref[:, s:e])
        rep = compare_audio(y_ref, y)
        assert rep.audio_passed, rep.summary()

    def test_unbounded_null_harness(self):
        # same class through the full null harness (engine render path)
        src = ("@block\n"
               "r = r + 1; r > 9 ? r = 3;\n"
               "@sample\n"
               "acc = 0;\n"
               "loop(r, acc = acc * 0.5 + spl0;);\n"
               "spl1 = acc * 0.3;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(2, 4000),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_too_heavy_rejects(self):
        body = "x += spl0;" * 200
        src = ("@block\nn = n + 100;\n"
               "@sample\n"
               f"loop(n * 100000, {body});\n"
               "spl0 = x * 1e-6;\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog, 48000.0)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 1,
                                     segment_len=512,
                                     masked_loop_k=4096)


class TestIntervalRead:
    def test_clamped_address_gather(self):
        # tex_read shape: clamp the frame, then linear interpolation
        # reads at base + floor(frame)*ch (ref Texture.jsfx:2547-2563)
        src = ("@init\ntex = 500; nfr = 64;\n"
               "i = 0; loop(128, tex[i] = sin(i * 0.21); i += 1;);\n"
               "@sample\n"
               "frame = abs(spl0) * 100;\n"
               "lim = nfr - 2;\n"
               "frame > lim ? frame = lim;\n"
               "frame < 0 ? frame = 0;\n"
               "i0 = floor(frame);\n"
               "frac = frame - i0;\n"
               "s0 = tex[i0 * 2];\n"
               "s1 = tex[i0 * 2 + 2];\n"
               "spl0 = s0 + (s1 - s0) * frac;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 3000),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_span_overlapping_written_cell_rejects(self):
        src = ("@init\ntab = 100;\n"
               "@sample\n"
               "tab[3] = spl0;\n"
               "j = abs(spl1) * 10; j > 7 ? j = 7;\n"
               "spl0 = tab[j | 0];\n")
        prog = compile_plugin_source(src)
        shadow = make_initialized_shadow(prog, 48000.0)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, shadow.state, 2,
                                     segment_len=512)
