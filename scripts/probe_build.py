"""Probe: attempt kernel BUILDS (vector then devexec) for a plugin and
report the rejection reasons.  eval_shape-only — no XLA compiles.

Usage: PYTHONPATH=/root/repo python scripts/probe_build.py <slug> [block]
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from zorak_tpu.catalog import discover
from zorak_tpu.lowering.devexec import DeviceExecKernel
from zorak_tpu.lowering.devgen import DevgenError
from zorak_tpu.lowering.specialize import (SpecializedSampleKernel,
                                           SpecializeError)
from zorak_tpu.verify.nulltest import make_initialized_shadow

specs = {s.slug: s for s in discover("/root/reference")}
slug = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
cand = [k for k in specs if slug.lower() in k.lower()]
print("candidates:", cand, flush=True)
prog = specs[cand[0]].load_program()

gold = make_initialized_shadow(prog, 48000.0, None)

t0 = time.time()
try:
    k = SpecializedSampleKernel(prog, gold.state, 2, 4096, block_size=B)
    print(f"VECTOR BUILD OK coupled={k.coupled} ({time.time()-t0:.1f}s)")
except (SpecializeError, DevgenError) as exc:
    print(f"vector: {type(exc).__name__}: {exc}  ({time.time()-t0:.1f}s)")
    t0 = time.time()
    try:
        k = DeviceExecKernel(prog, gold.state, 2, block_size=B)
        print(f"DEVEXEC BUILD OK heap={k.sample.mem_size} "
              f"({time.time()-t0:.1f}s)")
    except (SpecializeError, DevgenError) as exc2:
        print(f"devexec: {type(exc2).__name__}: {exc2} "
              f"({time.time()-t0:.1f}s)")
