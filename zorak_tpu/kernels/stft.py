"""STFT overlap-add processing on XLA FFT.

The TPU-native form of the reference catalog's Spectral-category pattern
(accumulate a block, fft_real, per-bin processing, ifft_real, overlap-add
— e.g. Sample.jsfx's FFT-512 decrust, PsychoConvolver's partitions): all
frames are processed AT ONCE as a batched FFT over [frames, fft_size],
instead of one FFT per @block.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

F64 = jnp.float64


def _frame(x: jnp.ndarray, size: int, hop: int) -> jnp.ndarray:
    """[T] -> [frames, size] with zero padding at the tail."""
    t = x.shape[-1]
    n_frames = max(1, -(-max(t - size, 0) // hop) + 1)
    pad = (n_frames - 1) * hop + size - t
    xp = jnp.pad(x, [(0, pad)])
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(size)[None, :])
    return xp[idx]


def stft(x: jnp.ndarray, size: int = 2048, hop: Optional[int] = None,
         window: Optional[jnp.ndarray] = None):
    """x: [T] real -> (spec [frames, size//2+1] complex, meta)."""
    hop = hop or size // 2
    if window is None:
        window = jnp.hanning(size).astype(F64)
    frames = _frame(x.astype(F64), size, hop) * window
    # TPU has no f64 FFT; f32 transforms are well inside the audio epsilon
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    return spec, (size, hop, window, x.shape[-1])


def istft(spec: jnp.ndarray, meta) -> jnp.ndarray:
    size, hop, window, t_out = meta
    # bin_fn may promote c64 -> c128 (e.g. multiplying by an f64 gain);
    # TPU FFT only takes c64, so normalize at the transform boundary
    frames = jnp.fft.irfft(spec.astype(jnp.complex64), size,
                           axis=-1).astype(F64) * window
    n_frames = frames.shape[0]
    total = (n_frames - 1) * hop + size
    y = jnp.zeros(total, dtype=F64)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(size)[None, :])
    y = y.at[idx.reshape(-1)].add(frames.reshape(-1))
    # overlap normalization for the analysis+synthesis window product
    wsum = jnp.zeros(total, dtype=F64)
    wsum = wsum.at[idx.reshape(-1)].add(
        jnp.broadcast_to(window * window, (n_frames, size)).reshape(-1))
    y = y / jnp.maximum(wsum, 1e-12)
    return y[:t_out]


def stft_process(x: jnp.ndarray, bin_fn: Callable, size: int = 2048,
                 hop: Optional[int] = None) -> jnp.ndarray:
    """Spectral processing pipeline: stft -> bin_fn(spec) -> istft.

    bin_fn receives [frames, bins] complex and returns the same shape;
    vmap/jit composable (use jax.vmap for channels).
    """
    spec, meta = stft(x, size, hop)
    return istft(bin_fn(spec), meta)


@partial(jax.jit, static_argnames=("size", "hop", "floor_db"))
def spectral_gate(x: jnp.ndarray, threshold_db: float = -50.0,
                  size: int = 2048, hop: Optional[int] = None,
                  floor_db: float = -24.0) -> jnp.ndarray:
    """Reference-style restoration denoiser: per-bin gating against a
    noise floor with psychoacoustic-ish soft knee (BASELINE config 3)."""
    def gate(spec):
        mag = jnp.abs(spec)
        # broadband noise estimate: the median across bins of each bin's
        # quiet-frame level (stationary tones occupy few bins, so the
        # median tracks the noise bed, not the signal)
        per_bin_quiet = jnp.percentile(mag, 10.0, axis=0)
        noise_est = jnp.median(per_bin_quiet)
        thr = jnp.maximum(noise_est, 10.0 ** (threshold_db / 20.0)) * 4.0
        over = mag / jnp.maximum(thr, 1e-12)
        gain = jnp.clip((over - 1.0) / 2.0, 0.0, 1.0)
        min_gain = 10.0 ** (floor_db / 20.0)
        g = min_gain + (1.0 - min_gain) * gain * gain * (3.0 - 2.0 * gain)
        # keep the spectrum c64: an f64 gain would promote to c128, and
        # the TPU f64-emulation pass can't expand a c64->c128 convert
        return spec * g.astype(jnp.float32)

    return stft_process(x, gate, size, hop)
