"""Catalog-wide null-test sweep: every plugin the vector engine accepts
must match the golden executor on real audio — the automated promotion of
the reference's interactive correctness-check workflow."""
import numpy as np
import pytest

from zorak_tpu.catalog import discover
from zorak_tpu.lowering import SpecializeError
from zorak_tpu.verify import null_test_plugin


def _vectorizable_specs():
    try:
        specs = discover("/root/reference")
    except Exception:
        return []
    return [s for s in specs if s.plugin_type == "jsfx"]


@pytest.mark.parametrize("spec", _vectorizable_specs(), ids=lambda s: s.slug)
def test_catalog_null(spec):
    prog = spec.load_program()
    ch = max(1, prog.io_channels["process"])
    n = 6000
    x = (np.random.RandomState(17).randn(ch, n) * 0.3).astype(np.float32)
    try:
        rep = null_test_plugin(prog, x, segment_len=2048, golden="native",
                               compare_state=False)
    except SpecializeError as exc:
        pytest.skip(f"shadow fallback: {exc}")
    assert rep.audio_passed, f"{spec.slug}: {rep.summary()}"
