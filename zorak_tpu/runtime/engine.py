"""Offline render engine: the framework's replacement for the DAW host.

Drives a plugin over audio the way the reference host does
(ref: src/JSFXJuceProcessor.cpp:3239-3772): slider push before @init,
@init, @slider, then block processing — but the audio path executes on
TPU through the vectorizing specializer when the plugin qualifies, with
the CPU golden shadow as fallback and as the always-available reference.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..ir.program import PluginProgram
from ..lowering import SpecializeError, specialize_sample_kernel
from ..verify.nulltest import make_initialized_shadow

DEFAULT_SEGMENT_LEN = 1 << 17

_stats_fn = None


def _audio_stats(y_dev):
    """On-device peak/rms/finite-count (download only 3 scalars)."""
    global _stats_fn
    import jax
    import jax.numpy as jnp

    if _stats_fn is None:
        _stats_fn = jax.jit(lambda a: (jnp.max(jnp.abs(a)),
                                       jnp.sqrt(jnp.mean(a * a)),
                                       jnp.sum(jnp.isfinite(a))))
    return _stats_fn(y_dev)


@dataclass
class RenderResult:
    audio: np.ndarray                  # float32 [channels, samples]
    srate: float
    engine: str                        # "tpu-vector" | "cpu-shadow"
    wall_seconds: float
    realtime_factor: float
    state: object = None               # final ShadowState (parity/debug)
    details: Dict = field(default_factory=dict)


class PluginInstance:
    """One initialized plugin configuration bound to an engine."""

    def __init__(self, program: PluginProgram, srate: float = 48000.0,
                 sliders: Optional[Dict[int, float]] = None,
                 segment_len: int = DEFAULT_SEGMENT_LEN,
                 prefer: str = "auto"):
        self.program = program
        self.srate = float(srate)
        self.sliders = dict(sliders or {})
        self.segment_len = segment_len
        self.nch = max(1, program.io_channels["process"])
        self.shadow = make_initialized_shadow(program, srate, self.sliders)
        self.kernel = None
        self.engine = "cpu-shadow"
        self.spec_error: Optional[str] = None
        if prefer in ("auto", "tpu"):
            try:
                self.kernel = specialize_sample_kernel(
                    program, self.shadow.state, self.nch, segment_len=segment_len)
                self.engine = "tpu-vector"
            except SpecializeError as exc:
                self.spec_error = str(exc)
                if prefer == "tpu":
                    raise

    def render(self, x: np.ndarray, block_size: int = 512,
               fetch_audio: bool = True, sync_state: bool = True) -> RenderResult:
        """x: float32 [channels, samples] at self.srate.

        fetch_audio=False keeps the rendered audio on device and returns
        on-device stats in details (peak/rms) instead — the fast path when
        the host link is slow or the result feeds further device compute.
        """
        x = np.ascontiguousarray(x, dtype=np.float32)
        if x.shape[0] < self.nch:
            pad = np.zeros((self.nch - x.shape[0], x.shape[1]), dtype=np.float32)
            x = np.concatenate([x, pad], axis=0)
        elif x.shape[0] > self.nch:
            x = x[: self.nch]

        t0 = time.perf_counter()
        if self.kernel is not None:
            if fetch_audio:
                y, carry = self.kernel.render(x)
            else:
                import jax
                import jax.numpy as jnp
                y_dev, carry = self.kernel.render_device(x)
                stats = _audio_stats(y_dev)
                jax.block_until_ready(stats)
                wall = time.perf_counter() - t0
                peak, rms, nfinite = (float(v) for v in stats)
                if sync_state:
                    self.kernel.writeback(carry, self.shadow.state)
                audio_seconds = x.shape[1] / self.srate
                return RenderResult(
                    audio=None, srate=self.srate, engine=self.engine,
                    wall_seconds=wall,
                    realtime_factor=(audio_seconds / wall) if wall > 0 else float("inf"),
                    state=self.shadow.state,
                    details={"peak": peak, "rms": rms,
                             "all_finite": nfinite == y_dev.size,
                             "audio_device": y_dev})
            self.kernel.writeback(carry, self.shadow.state)
        else:
            y = np.zeros_like(x)
            total = x.shape[1]
            for start in range(0, total, block_size):
                stop = min(start + block_size, total)
                self.shadow.process_block(x[:, start:stop], y[:, start:stop])
        wall = time.perf_counter() - t0

        audio_seconds = x.shape[1] / self.srate
        return RenderResult(
            audio=y, srate=self.srate, engine=self.engine, wall_seconds=wall,
            realtime_factor=(audio_seconds / wall) if wall > 0 else float("inf"),
            state=self.shadow.state,
            details={"spec_error": self.spec_error} if self.spec_error else {},
        )


def render_file(program: PluginProgram, in_path: str | Path,
                out_path: Optional[str | Path] = None,
                sliders: Optional[Dict[int, float]] = None,
                prefer: str = "auto") -> RenderResult:
    from . import wavio

    x, rate = wavio.read_wav(in_path)
    inst = PluginInstance(program, srate=float(rate), sliders=sliders, prefer=prefer)
    result = inst.render(x)
    if out_path is not None:
        wavio.write_wav(out_path, result.audio, int(rate))
    return result
