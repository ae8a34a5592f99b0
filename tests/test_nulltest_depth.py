"""Null-harness state-compare depth: memory pages, sorted MIDI output and
pending slider masks, promoted from the reference harness
(ref: src/JSFXCorrectnessCheck.h:915-1040)."""
import numpy as np

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.verify import null_test_plugin
from zorak_tpu.verify.nulltest import (
    NullReport, compare_memory_pages, compare_midi_out,
    compare_pending_masks)


def noise(nch, n, scale=0.5, seed=3):
    return (np.random.RandomState(seed).randn(nch, n) * scale).astype(np.float32)


class _St:
    def __init__(self, mem, used, masks=(0, 0, 0)):
        self.mem = np.asarray(mem, dtype=np.float64)
        self.mem_used = used
        (self.pending_change_mask, self.pending_automate_mask,
         self.pending_automate_end_mask) = masks


class TestCompareUnits:
    def test_mem_pages_equal(self):
        a = _St(np.arange(3000.0), 3000)
        b = _St(np.arange(3000.0), 3000)
        rep = compare_memory_pages(a, b)
        assert rep.mem_mismatch is None

    def test_mem_pages_latch_first_with_page(self):
        a = _St(np.zeros(5000), 5000)
        m = np.zeros(5000)
        m[1500] = 1.0e-3
        m[4000] = 2.0
        b = _St(m, 5000)
        rep = compare_memory_pages(a, b)
        assert rep.mem_mismatch == (1500, 1, 0.0, 1.0e-3)
        assert not rep.passed

    def test_mem_pages_extent_zero_fill(self):
        # the shorter side reads as zeros past its extent (ref :1013-1022)
        a = _St(np.zeros(1024), 1024)
        m = np.zeros(2048)
        m[1500] = 7.0
        b = _St(m, 2048)
        rep = compare_memory_pages(a, b)
        assert rep.mem_mismatch == (1500, 1, 0.0, 7.0)
        b2 = _St(np.zeros(2048), 2048)
        assert compare_memory_pages(a, b2).mem_mismatch is None

    def test_midi_out_sorted_compare(self):
        # stable sort by offset before comparing (ref :949-960)
        a = [(10, 0x90, 60, 100), (5, 0x80, 60, 0)]
        b = [(5, 0x80, 60, 0), (10, 0x90, 60, 100)]
        assert compare_midi_out(a, b).midi_mismatch is None

    def test_midi_out_count_mismatch(self):
        rep = compare_midi_out([(0, 0x90, 60, 1)], [])
        assert rep.midi_mismatch == ("midiOutCount", 1, 0)

    def test_midi_out_event_mismatch(self):
        rep = compare_midi_out([(0, 0x90, 60, 1)], [(0, 0x90, 61, 1)])
        assert rep.midi_mismatch is not None
        assert rep.midi_mismatch[0] == "midiOut[0]"

    def test_pending_masks(self):
        a = _St([], 0, masks=(0b101, 0, 0))
        b = _St([], 0, masks=(0b101, 0, 0))
        assert compare_pending_masks(a, b).mask_mismatch is None
        c = _St([], 0, masks=(0b100, 0, 0))
        rep = compare_pending_masks(a, c)
        assert rep.mask_mismatch == ("pending_change_mask", 0b101, 0b100)
        assert not rep.passed


class TestEndToEnd:
    def test_mem_compare_in_null_test(self):
        src = ("@init\nbuf = 0; i = 0;\n"
               "@sample\nbuf[i] = spl0;\n"
               "r = i - 2000;\n"
               "r < 0 ? r += 4096;\n"
               "spl0 = buf[r];\n"
               "i += 1; i >= 4096 ? i = 0;\n")
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 6000),
                               compare_mem=True)
        assert rep.passed, rep.summary()
        assert rep.mem_mismatch is None

    def test_midi_passthrough_uncoupled_block(self):
        # @block midirecv -> midisend rides the host trajectory; the vector
        # render must report the identical sorted event list
        src = ("@block\n"
               "while (midirecv(ofs, m1, m2, m3)) (\n"
               "  midisend(ofs, m1, m2, m3);\n"
               ");\n"
               "@sample\nspl0 = spl0 * 0.5;\n")
        midi = [(100, 0x90, 60, 100), (700, 0x80, 60, 0),
                (1500, 0x90, 64, 90)]
        rep = null_test_plugin(compile_plugin_source(src), noise(1, 2048),
                               midi=midi)
        assert rep.passed, rep.summary()

    def test_sliderchange_mask_parity(self):
        # @block raising sliderchange: both sides consume it via @slider,
        # pending masks must agree at the end
        src = ("@init\nn = 0;\n"
               "@slider\ng = slider1 / 100;\n"
               "@block\nn += 1;\n"
               "@sample\nspl0 *= g;\n")
        rep = null_test_plugin(compile_plugin_source(
            "slider1:50<0,100,1>Gain\n" + src), noise(1, 4000))
        assert rep.passed, rep.summary()
