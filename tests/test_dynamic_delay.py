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
