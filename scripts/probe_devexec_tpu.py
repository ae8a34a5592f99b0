"""Probe: run a catalog plugin through the sequential device executor on
the REAL TPU and null-test a short render vs the Python golden.

Compiles go through the remote compile server (cached across processes),
so this costs little local CPU beyond tracing.

Usage: PYTHONPATH=/root/repo python scripts/probe_devexec_tpu.py <slug> [T] [block]
"""
import sys
import time

import jax
jax.config.update("jax_enable_x64", True)

from zorak_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np

from zorak_tpu.catalog import discover
from zorak_tpu.verify.nulltest import null_test_plugin

print("devices:", jax.devices(), flush=True)
if jax.default_backend() != "tpu":
    # the axon tunnel can fail init transiently and jax silently falls
    # back to CPU — a "TPU" probe result from XLA:CPU is meaningless
    print("backend is not tpu; aborting (exit 3)", flush=True)
    sys.exit(3)

specs = {s.slug: s for s in discover("/root/reference")}
slug = sys.argv[1] if len(sys.argv) > 1 else "texture"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
cand = [k for k in specs if slug.lower() in k.lower()]
print("candidates:", cand, flush=True)
spec = specs[cand[0]]
prog = spec.load_program()

rng = np.random.default_rng(7)
x = (rng.standard_normal((2, T)) * 0.25).astype(np.float32)

from zorak_tpu.verify.nulltest import EMULATED_F64_SCALAR_EPS

t0 = time.time()
# TPU f64 is an f32-pair emulation: scalars are judged at the documented
# emulated-f64 contract (docs/tpu_f64.md); strict-1e-8 mismatches are
# still counted below for transparency
rep = null_test_plugin(prog, x, 48000.0, block_size=B,
                       compare_state=True, compare_mem=True,
                       golden="native", engine="devexec",
                       scalar_eps=EMULATED_F64_SCALAR_EPS)
print(f"elapsed {time.time()-t0:.1f}s", flush=True)
print(rep.summary(), flush=True)
print("PASSED" if rep.passed else "FAILED", flush=True)
for vm in rep.var_mismatches[:20]:
    print("VAR:", vm, flush=True)
