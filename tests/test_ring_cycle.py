"""Ring-ring delay cycles (VERDICT r4 #10 / SURVEY §7 hard-parts #2):
two delay lines each reading the OTHER's delayed output form a cycle in
the ring dependency graph.  When the minimum coupling delay is at least
one block, the vectorizer time-blocks the segment (_SegmentRetry
shrinks L so every cross-ring read reaches only the previous segment's
carried rings) and stays bit-exact; a sub-block coupling delay rejects
honestly (sequential fallback covers it)."""
import numpy as np
import pytest

from zorak_tpu.ir import compile_plugin_source
from zorak_tpu.lowering import SpecializeError
from zorak_tpu.verify.nulltest import null_test_plugin


def _src(delay: int) -> str:
    return f"""\
@init
M = 512;
D = {delay};
A = 4096;
B = 8192;
@sample
ra = ia - D; ra < 0 ? ra += M;
rb = ib - D; rb < 0 ? rb += M;
A[ia] = spl0 + 0.5 * B[rb];
B[ib] = spl1 + 0.4 * A[ra];
spl0 = A[ia] - 0.25 * B[rb];
spl1 = B[ib];
ia += 1; ia >= M ? ia = 0;
ib += 1; ib >= M ? ib = 0;
"""


def test_cross_ring_cycle_time_blocks_bit_exact():
    # coupling delay 300 >= block 64: the segment time-blocks to
    # (300 // 64) * 64 = 256 (the quantum is the host block size — the
    # scan's segments must land on @block boundaries) and vectorizes
    # bit-exact, state+mem deep
    prog = compile_plugin_source(_src(300))
    x = (np.random.RandomState(3).randn(2, 4000) * 0.3).astype(np.float32)
    rep = null_test_plugin(prog, x, 48000.0, block_size=64,
                           compare_state=True, compare_mem=True,
                           golden="native")
    assert rep.passed, rep.summary()


def test_cross_ring_cycle_subblock_delay_rejects():
    # coupling delay 3 < one block: genuine sample-rate cross-ring
    # feedback — the vectorizer must reject (honest fallback), not
    # produce stale-history audio
    prog = compile_plugin_source(_src(3))
    x = (np.random.RandomState(3).randn(2, 1024) * 0.3).astype(np.float32)
    with pytest.raises(SpecializeError, match="cyclic|coupling"):
        null_test_plugin(prog, x, 48000.0, block_size=512,
                         compare_state=True, compare_mem=True,
                         golden="native")


def test_cross_ring_cycle_devexec_covers_subblock():
    # the engine's actual fallback for the rejected shape: sequential
    # device executor, held to the same deep contract
    prog = compile_plugin_source(_src(3))
    x = (np.random.RandomState(9).randn(2, 256) * 0.3).astype(np.float32)
    rep = null_test_plugin(prog, x, 48000.0, block_size=64,
                           compare_state=True, compare_mem=True,
                           golden="native", engine="devexec")
    assert rep.passed, rep.summary()
