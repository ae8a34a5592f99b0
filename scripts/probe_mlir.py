"""Probe: build a plugin's devexec kernel and measure the LOWERED
StableHLO module size (no compile) — the remote TPU compile helper
SIGKILLs programs past ~7 MB, so this is the go/no-go gate for running
a fallback plugin on the real chip.

Usage: PYTHONPATH=/root/repo python scripts/probe_mlir.py <slug> [T] [block]
"""
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from zorak_tpu.catalog import discover
from zorak_tpu.lowering.devexec import DeviceExecKernel
from zorak_tpu.verify.nulltest import make_initialized_shadow

specs = {s.slug: s for s in discover("/root/reference")}
slug = sys.argv[1]
T = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
cand = [k for k in specs if slug.lower() in k.lower()]
print("candidates:", cand, flush=True)
prog = specs[cand[0]].load_program()
gold = make_initialized_shadow(prog, 48000.0, None)

t0 = time.time()
kern = DeviceExecKernel(prog, gold.state, 2, block_size=B)
print(f"build {time.time() - t0:.1f}s heap={kern.sample.mem_size} "
      f"midi={kern.accepts_midi}", flush=True)

carry = kern.initial_carry()
if kern.uses_rand:
    carry = kern._stage_rand_pool(carry, True)
x = np.zeros((2, T), np.float32)
t0 = time.time()
if kern.accepts_midi:
    mev, mn = kern._midi_planes(None, T)
    fn = jax.jit(kern._make_run(T, midi_k=mev.shape[1]),
                 donate_argnums=(0,))
    low = fn.lower(carry, x, mev, mn)
else:
    fn = jax.jit(kern._make_run(T), donate_argnums=(0,))
    low = fn.lower(carry, x)
txt = low.as_text()
from jax.interpreters import mlir as _mlir
bc = _mlir.module_to_bytecode(low.compiler_ir())
print(f"lower {time.time() - t0:.1f}s text_bytes={len(txt)} "
      f"bytecode_bytes={len(bc)}", flush=True)
with open(f"/tmp/{cand[0]}_lowered.mlir", "w") as f:
    f.write(txt)
import collections
import re
ops = collections.Counter(re.findall(r"stablehlo\.\w+|scf\.\w+|func\.\w+",
                                     txt))
print("top ops:", ops.most_common(15), flush=True)
