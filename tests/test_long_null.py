"""Long-render bit-exactness: the vector engine vs the native C golden
over minutes of audio, far past every ring-buffer wrap and scan-segment
boundary. Opt in with RUN_SLOW=1 (takes ~35s on CPU).

Last recorded result (2026-08-16, 30s DDT, 2ch x 1_440_000 samples):
max |delta| = 0.0 (-inf dBFS), rms = 0.0, var mismatches = 0 — bit-exact.
"""
import os

import numpy as np
import pytest

from zorak_tpu.catalog import discover
from zorak_tpu.verify import null_test_plugin

pytestmark = pytest.mark.slow

if not os.environ.get("RUN_SLOW"):
    pytest.skip("set RUN_SLOW=1 to run long-render validation",
                allow_module_level=True)


def test_ddt_30s_bit_exact():
    spec = next(s for s in discover("/root/reference") if s.slug == "DDT")
    prog = spec.load_program()
    n = 30 * 48000
    rng = np.random.RandomState(99)
    x = (rng.randn(2, n) * 0.3).astype(np.float32)
    rep = null_test_plugin(prog, x, segment_len=1 << 15, golden="native",
                           compare_state=False)
    assert rep.audio_passed, rep.summary()
    # stronger than the 1e-5 contract: this path has historically been
    # bit-exact on CPU; flag any regression from that
    assert rep.max_abs_delta <= 1e-7, rep.summary()
