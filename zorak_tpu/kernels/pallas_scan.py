"""Pallas TPU kernel: batched switching one-pole (attack/release) scan.

The genuinely sequential recurrence
    z[t] = x[t] + (z[t-1] - x[t]) * (up if x[t] > z[t-1] else dn)
cannot be reformulated as an associative scan (the coefficient depends on
the state).  XLA's lax.scan pays while-loop overhead per step; this
kernel runs the loop over VMEM-resident chunks with the carry held in
scratch across the (sequentially executed) TPU grid, and vectorizes the
lane axis on the VPU — many followers advance per step.

f32 only (Mosaic has no f64); used as the opt-in fast path for the
Faust-family followers (dspkit.switching_onepole(..., pallas=True)).
The f64 contract paths keep lax.scan.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

LANES = 128


def _kernel(x_ref, up_ref, dn_ref, z0_ref, y_ref, z_scratch):
    import jax.experimental.pallas as pl

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        z_scratch[...] = z0_ref[...]

    chunk = x_ref.shape[0]
    up = up_ref[...]   # (1, lanes) — Mosaic wants rank >= 2 values
    dn = dn_ref[...]

    def body(t, carry):
        z = z_scratch[...]
        xt = x_ref[pl.ds(t, 1), :]
        pole = jnp.where(xt > z, up, dn)
        z = xt + (z - xt) * pole
        y_ref[pl.ds(t, 1), :] = z
        z_scratch[...] = z
        return carry

    lax.fori_loop(0, chunk, body, 0)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def switching_scan_pallas(x: jnp.ndarray, up: jnp.ndarray, dn: jnp.ndarray,
                          z0: jnp.ndarray, chunk: int = 1024,
                          interpret: bool = False) -> jnp.ndarray:
    """x: [T, lanes] f32; up/dn/z0: [lanes] f32 -> y [T, lanes] f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, lanes = x.shape
    pad_t = (-t) % chunk
    pad_l = (-lanes) % LANES
    xp = jnp.pad(x.astype(jnp.float32), ((0, pad_t), (0, pad_l)))
    upp = jnp.pad(up.astype(jnp.float32), (0, pad_l))[None, :]
    dnp = jnp.pad(dn.astype(jnp.float32), (0, pad_l))[None, :]
    z0p = jnp.pad(z0.astype(jnp.float32), (0, pad_l))[None, :]
    tt, ll = xp.shape

    y = pl.pallas_call(
        _kernel,
        grid=(tt // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, ll), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ll), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ll), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ll), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, ll), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tt, ll), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, ll), jnp.float32)],
        interpret=interpret,
    )(xp, upp, dnp, z0p)
    return y[:t, :lanes]


def switching_onepole_pallas(x: jnp.ndarray, up_pole, dn_pole, z0=0.0,
                             interpret: bool = False) -> jnp.ndarray:
    """dspkit-compatible wrapper: x [..., T] -> y [..., T] (f32 path)."""
    lead = x.shape[:-1]
    t = x.shape[-1]
    lanes = max(1, int(jnp.prod(jnp.array(lead)))) if lead else 1
    xl = x.reshape((lanes, t)).T if lead else x.reshape((t, 1))
    up = jnp.broadcast_to(jnp.asarray(up_pole, jnp.float32), (xl.shape[1],))
    dn = jnp.broadcast_to(jnp.asarray(dn_pole, jnp.float32), (xl.shape[1],))
    z0v = jnp.broadcast_to(jnp.asarray(z0, jnp.float32), (xl.shape[1],))
    y = switching_scan_pallas(xl, up, dn, z0v, interpret=interpret)
    return (y.T.reshape(lead + (t,)) if lead else y[:, 0]).astype(x.dtype)
