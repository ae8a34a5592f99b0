"""Probe: what blocks CMD's coupled @block from fusing?

Instruments DeviceSection._merged to count dirty-arm fallbacks and
oversized logs, then attempts a build with the budget lifted.
"""
import sys
import collections

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from zorak_tpu.catalog import discover
from zorak_tpu.lowering import devgen

stats = collections.Counter()
log_sizes = []
dirty_reasons = []

orig_merged = devgen.DeviceSection._merged


def patched(self, cond, then_fn, else_fn):
    return orig_merged(self, cond, then_fn, else_fn)


orig_mark = devgen.DeviceSection._mark_mem_dirty
import traceback


def mark(self):
    if self._merge_log is not None and not self._merge_dirty:
        tb = traceback.extract_stack(limit=8)
        site = ";".join(f"{f.name}:{f.lineno}" for f in tb[:-1][-4:])
        dirty_reasons.append(site)
    orig_mark(self)


devgen.DeviceSection._mark_mem_dirty = mark

# lift the budget so we see the full merge profile
devgen.DeviceSection._MERGE_BUDGET = 10 ** 9

# widen the per-merge log cap via monkeypatching? the 128 constant is
# inline; instead count log sizes by wrapping _merged
orig = devgen.DeviceSection._merged


def wrapped(self, cond, then_fn, else_fn):
    n0 = self._n_fallback_merges
    r = orig(self, cond, then_fn, else_fn)
    if self._n_fallback_merges > n0:
        stats["fallback"] += 1
    else:
        stats["clean"] += 1
    return r


devgen.DeviceSection._merged = wrapped

specs = {s.slug: s for s in discover("/root/reference")}
slug = sys.argv[1] if len(sys.argv) > 1 else "cmd"
cand = [k for k in specs if slug.lower() in k.lower()]
print("candidates:", cand)
spec = specs[cand[0]]
prog = spec.load_program()

from zorak_tpu.lowering.specialize import SpecializedSampleKernel, SpecializeError
from zorak_tpu.verify.nulltest import make_initialized_shadow

snap_owner = make_initialized_shadow(prog, 48000.0, None)
try:
    k = SpecializedSampleKernel(prog, snap_owner.state, 2, 4096, block_size=512)
    print("BUILD OK", k.coupled)
except SpecializeError as exc:
    print("SpecializeError:", exc)
except devgen.DevgenError as exc:
    print("DevgenError:", exc)
finally:
    print("merge stats:", dict(stats))
    cnt = collections.Counter(dirty_reasons)
    for site, n in cnt.most_common(15):
        print(f"{n:6d}  {site}")
