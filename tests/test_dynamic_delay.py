"""Dynamic-address ring/table reads in the vector engine."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source, load_plugin_file
from zorak_tpu.lowering import SpecializeError, specialize_sample_kernel
from zorak_tpu.verify import make_initialized_shadow, null_test_plugin


def noise(ch, n, scale=0.4, seed=9):
    return (np.random.RandomState(seed).randn(ch, n) * scale).astype(np.float32)


class TestDynamicReads:
    def test_modulated_delay(self):
        # chorus-style time-varying delay driven by an LFO
        src = ("@init\nMASK = 1023;\n"
               "@sample\n"
               "buf[w & MASK] = spl0;\n"
               "ph += 0.01;\n"
               "d = (40 + 30*sin(ph)) | 0;\n"
               "spl0 = 0.5*spl0 + 0.5*buf[(w - d) & MASK];\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 5000),
                               segment_len=1024)
        assert rep.passed, rep.summary()

    def test_signal_dependent_delay(self):
        src = ("@init\nMASK = 511;\n"
               "@sample\n"
               "buf[w & MASK] = spl0;\n"
               "d = (10 + abs(spl1)*200) | 0;\n"
               "spl0 = buf[(w - d) & MASK];\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(2, 4000),
                               segment_len=512)
        assert rep.passed, rep.summary()

    def test_wavetable_lookup(self):
        # static table (filled in @init) read at an audio-rate index
        src = ("@init\ntab = 100;\n"
               "i = 0; loop(256, tab[i] = sin(i * $pi / 128); i += 1;);\n"
               "@sample\n"
               "ph += 0.3 + 0.2*spl0;\n"
               "spl0 = tab[(ph | 0) & 255];\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 4000),
                               segment_len=1024)
        assert rep.passed, rep.summary()

    def test_delay_crossing_segments(self):
        src = ("@init\nMASK = 255;\n"
               "@sample\nbuf[w & MASK] = spl0;\n"
               "d = 100 + ((w >> 5) & 63);\n"
               "spl0 = buf[(w - d) & MASK];\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 2000),
                               segment_len=256)
        assert rep.passed, rep.summary()

    def test_read_before_write_same_slot(self):
        # reading the current slot BEFORE writing it sees the value from a
        # full ring revolution ago
        src = ("@init\nMASK = 63;\n"
               "@sample\n"
               "old = buf[w & MASK];\n"
               "buf[w & MASK] = spl0;\n"
               "spl0 = old;\n"
               "w += 1;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 500),
                               segment_len=128)
        assert rep.passed, rep.summary()

    def test_catalog_dpt(self, reference_plugins):
        prog = load_plugin_file(reference_plugins / "Spatialization/DPT/src/DPT.jsfx")
        x = noise(2, 6000, scale=0.3)
        try:
            rep = null_test_plugin(prog, x, segment_len=2048, compare_state=False)
        except SpecializeError as exc:
            pytest.skip(f"DPT not vectorizable yet: {exc}")
        assert rep.audio_passed, rep.summary()


class TestRingRingCycles:
    SRC = ("@init\nbufA = 0; bufB = 4096;\n"
           "@sample\n"
           "ia += 1; ia >= 1024 ? ia = 0;\n"
           "ib += 1; ib >= 1024 ? ib = 0;\n"
           "ra = ia - 600; ra < 0 ? ra += 1024;\n"
           "rb = ib - 700; rb < 0 ? rb += 1024;\n"
           "bufA[ia] = spl0 * 0.5 + bufB[rb] * 0.4;\n"
           "bufB[ib] = spl0 * 0.3 + bufA[ra] * 0.45;\n"
           "spl0 = bufA[ra] * 0.5 + bufB[rb] * 0.5;\n")

    def test_cycle_breaks_via_time_blocked_segments(self):
        # mutually-coupled delay lines (A reads B's 700-sample-old output
        # while B reads A's 600-sample-old output): vectorizable once the
        # segment shrinks below the minimum coupling delay — the retry
        # ladder must land on L=512 and null-test bit-exact
        prog = compile_plugin_source(self.SRC)
        snap = make_initialized_shadow(prog, 48000.0, None)
        kern = specialize_sample_kernel(prog, snap.state, 1,
                                        segment_len=1 << 14)
        assert kern.L == 512  # shrunk from 16384 to the coupling bound
        rep = null_test_plugin(prog, noise(1, 5000), segment_len=1 << 14)
        assert rep.passed, rep.summary()

    def test_unbreakable_cycle_still_rejects(self):
        # 1-sample mutual coupling cannot be time-blocked (min delay <
        # one block) — must reject honestly, not loop
        src = ("@init\nbufA = 0; bufB = 256;\n"
               "@sample\n"
               "i += 1; i >= 64 ? i = 0;\n"
               "p = i - 1; p < 0 ? p += 64;\n"
               "bufA[i] = spl0 + bufB[p] * 0.4;\n"
               "bufB[i] = spl0 - bufA[p] * 0.3;\n"
               "spl0 = bufA[p];\n")
        prog = compile_plugin_source(src)
        snap = make_initialized_shadow(prog, 48000.0, None)
        with pytest.raises(SpecializeError):
            specialize_sample_kernel(prog, snap.state, 1,
                                     segment_len=1 << 14)
