"""Probe: step a plugin block-by-block on devexec vs the Python golden
and report the top-diverging VARS after every block — finds the first
divergent var (the root cause) without guessing the dependency chain.

Usage: PYTHONPATH=... python scripts/probe_var_all.py <slug> [nblocks] [B]
"""
import sys

import jax

jax.config.update("jax_enable_x64", True)

from zorak_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

from zorak_tpu.catalog import discover
from zorak_tpu.lowering.devexec import DeviceExecKernel
from zorak_tpu.verify.nulltest import make_initialized_shadow

print("devices:", jax.devices(), flush=True)

specs = {s.slug: s for s in discover("/root/reference")}
slug = sys.argv[1]
nblocks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
cand = [k for k in specs if slug.lower() in k.lower()]
prog = specs[cand[0]].load_program()

gold = make_initialized_shadow(prog, 48000.0, None)
kern = DeviceExecKernel(prog, gold.state, 2, block_size=B)
print("kernel built", flush=True)

rng = np.random.default_rng(7)
x = (rng.standard_normal((2, nblocks * B)) * 0.25).astype(np.float32)

var_slots = [(k[1], s) for k, s in kern.sample.slots.items()
             if k[0] == "var" and not k[1].startswith("__")]
carry = None
for b in range(nblocks):
    xb = x[:, b * B:(b + 1) * B]
    y_dev, carry = kern.render_device(xb, carry)
    bv = np.asarray(carry[0])
    yg = np.zeros_like(xb)
    gold.process_block(xb, yg)
    yd = np.asarray(y_dev)
    aerr = float(np.max(np.abs(yd.astype(np.float32) - yg)))
    diffs = []
    for nm, s in var_slots:
        gv = gold.state.V.get(nm, 0.0)
        dv = float(bv[s])
        if gv != dv:
            d = abs(gv - dv)
            rel = d / max(abs(gv), 1e-300)
            diffs.append((max(d, rel), nm, gv, dv, d))
    diffs.sort(reverse=True)
    print(f"block {b} audio_err={aerr:.3e} n_diff={len(diffs)}", flush=True)
    for _, nm, gv, dv, d in diffs[:10]:
        print(f"    {nm}: g={gv!r} d={dv!r} |d|={d:.3e}", flush=True)
