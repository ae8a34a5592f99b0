"""Catalog-wide null-test sweep: every plugin the vector engine accepts
must match the golden executor on real audio AND state — the automated
promotion of the reference's interactive correctness-check workflow
(ref: src/JSFXCorrectnessCheck.h:915-1040: vars each stage, mem pages,
sorted MIDI out, pending slider masks).

Two slider configurations per plugin (defaults + perturbed) and a
MIDI-carrying case for midi plugins.  Slider-perturbed runs of the
heavyweight coupled plugins recompile the whole fused program (folded
slider constants), so those are gated behind RUN_SLOW=1.
"""
import os

import numpy as np
import pytest

from zorak_tpu.catalog import discover
from zorak_tpu.lowering import SpecializeError
from zorak_tpu.verify import null_test_plugin

RUN_SLOW = os.environ.get("RUN_SLOW") == "1"

# fused/coupled pipelines whose compile is minutes-scale per slider config
HEAVY = {"TSEQ", "ERBTilt", "DOT", "SpectralStabilizer", "CMD",
         "PsychoConvolver", "Roomalizer", "Contour", "3DPanner"}


def _vectorizable_specs():
    try:
        specs = discover("/root/reference")
    except Exception:
        return []
    return [s for s in specs if s.plugin_type == "jsfx"]


def _perturbed_sliders(prog):
    """Deterministic non-default values for the first few numeric sliders:
    a point 40% of the way across each range away from the default."""
    over = {}
    for d in prog.slider_decls[:4]:
        if d.is_string or d.is_choice or d.hidden \
                or d.hi is None or d.lo is None:
            continue
        lo, hi = float(d.lo), float(d.hi)
        if not (hi > lo):
            continue
        val = lo + 0.4 * (hi - lo)
        if d.step:
            step = float(d.step)
            if step > 0:
                val = lo + round((val - lo) / step) * step
        val = min(hi, max(lo, val))
        if val != d.default:
            over[d.index0] = val
    return over


def _null(spec, slider_overrides=None, midi=None, allow_devexec=True):
    prog = spec.load_program()
    ch = max(1, prog.io_channels["process"])
    n = 6000
    x = (np.random.RandomState(17).randn(ch, n) * 0.3).astype(np.float32)
    try:
        rep = null_test_plugin(prog, x, segment_len=2048, golden="native",
                               compare_state=True, compare_mem=True,
                               slider_overrides=slider_overrides, midi=midi)
    except SpecializeError as exc:
        # the vectorizer rejected: the sequential device executor is the
        # engine's actual fallback — hold it to the same contract.  The
        # catalog plugins that land here are the multi-kLoC ones whose
        # devexec XLA:CPU compile is minutes-to-hours (3DPanner ~20 min,
        # Texture >50 min), so the sweep only attempts them under
        # RUN_SLOW=1; the devexec contract itself is covered every run by
        # tests/test_devexec.py on fast synthetic plugins.
        if not allow_devexec or not RUN_SLOW:
            pytest.skip(f"shadow fallback: {exc}")
        try:
            rep = null_test_plugin(
                prog, x, segment_len=2048, golden="native",
                compare_state=True, compare_mem=True,
                slider_overrides=slider_overrides, midi=midi,
                engine="devexec")
        except SpecializeError as exc2:
            pytest.skip(f"shadow fallback: {exc}; devexec: {exc2}")
    assert rep.passed, f"{spec.slug}: {rep.summary()}"


@pytest.mark.parametrize("spec", _vectorizable_specs(), ids=lambda s: s.slug)
def test_catalog_null(spec):
    _null(spec)


@pytest.mark.parametrize("spec", _vectorizable_specs(), ids=lambda s: s.slug)
def test_catalog_null_perturbed(spec):
    if spec.slug in HEAVY and not RUN_SLOW:
        pytest.skip("slider-perturbed fused recompile is minutes-scale; "
                    "RUN_SLOW=1 enables")
    prog = spec.load_program()
    over = _perturbed_sliders(prog)
    if not over:
        pytest.skip("no numeric sliders to perturb")
    _null(spec, slider_overrides=over)


# -- big-plugin devexec coverage in the DEFAULT gate (VERDICT r3 #7) ---------
#
# The flagship plugins the vectorizer rejects used to be exercised only
# under RUN_SLOW=1, so a regression in their handling never failed CI.
# A tiny-T null (256 samples, block 64) is enough to cover the devexec
# build + render + writeback path, and with the devgen trace cache
# (lowering/tracecache.py) + the persistent XLA compile cache the warm
# cost is seconds; the cold cost (~1-3 min each) is paid once per
# container.  Sample.jsfx joins when its first device render lands.

_DEVEXEC_TINY = ["3DPanner", "Texture", "Sample"]


@pytest.mark.parametrize("slug", _DEVEXEC_TINY)
def test_big_plugin_devexec_tiny_null(slug):
    specs = {s.slug: s for s in _vectorizable_specs()}
    if slug not in specs:
        pytest.skip("reference catalog not available")
    if slug == "Sample" and not RUN_SLOW:
        # Sample's cold devgen trace is ~27 min of single-core Python
        # (reified thereafter; see lowering/tracecache.py) — too heavy
        # for the fast tier's first run on a fresh container
        pytest.skip("Sample tiny null under RUN_SLOW=1 (cold trace ~27min)")
    prog = specs[slug].load_program()
    ch = max(1, prog.io_channels["process"])
    x = (np.random.RandomState(23).randn(ch, 256) * 0.3).astype(np.float32)
    rep = null_test_plugin(prog, x, block_size=64, golden="native",
                           compare_state=True, compare_mem=True,
                           engine="devexec")
    assert rep.passed, f"{slug}: {rep.summary()}"


def _reads_midi(s):
    try:
        return "midirecv" in s.entry_path.read_text(errors="replace")
    except Exception:
        return False


@pytest.mark.parametrize("spec", [
    s for s in _vectorizable_specs() if _reads_midi(s)
], ids=lambda s: s.slug)
def test_catalog_null_midi(spec):
    midi = [(97, 0x90, 60, 100), (1553, 0x80, 60, 0),
            (2200, 0xB0, 1, 64), (4801, 0x90, 67, 90)]
    _null(spec, midi=midi)
