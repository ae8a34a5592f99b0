#!/usr/bin/env python3
"""Multi-config benchmark suite (BASELINE.json configs).

Prints one JSON line per config to stdout; progress to stderr.
Run on the TPU: `python benchmarks/suite.py [--seconds 60]`.

Configs:
  1. ddt          — DDT dynamics, 60s 48kHz stereo offline render (RTx)
  2. stft         — 2048-pt STFT overlap-add bin processing via XLA FFT
  3. denoiser     — spectral gate restoration (kernels.stft.spectral_gate)
  4. convolution  — partitioned FIR convolution, 2s IR (131072 taps)
  5. catalog      — every vectorizable catalog plugin over one input
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

T0 = time.time()


def log(msg):
    print(f"[suite {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(name, rtx, extra=None):
    out = {"metric": f"{name}_rtx", "value": round(rtx, 1),
           "unit": "x_realtime_48k"}
    out.update(extra or {})
    print(json.dumps(out), flush=True)


def timed_rtx(fn, audio_seconds, warmup=1, runs=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = max(best, audio_seconds / (time.perf_counter() - t0))
    return best


def main():
    from zorak_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--catalog", default="/root/reference")
    ap.add_argument("--configs", default="ddt,stft,denoiser,convolution,catalog")
    ap.add_argument("--files", type=int, default=4,
                    help="files-axis width for catalog_files")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    secs = args.seconds
    srate = 48000.0
    n = int(secs * srate)
    rng = np.random.RandomState(11)
    configs = set(args.configs.split(","))

    if "ddt" in configs:
        from zorak_tpu.ir import load_plugin_file
        from zorak_tpu.lowering import specialize_sample_kernel
        from zorak_tpu.verify import make_initialized_shadow

        seg = 1 << 17
        nseg = max(1, n // seg)
        prog = load_plugin_file(Path(args.catalog) /
                                "plugins/Spatialization/DDT/src/DDT.jsfx")
        kern = specialize_sample_kernel(
            prog, make_initialized_shadow(prog, srate).state, 2,
            segment_len=seg)
        x = (rng.randn(2, seg * nseg) * 0.25).astype(np.float32)
        log("ddt: compiling")
        rtx = timed_rtx(lambda: kern.render_device(x)[0], seg * nseg / srate)
        emit("ddt_offline_render", rtx, {"vs_baseline": round(rtx / 1000.0, 3)})

    if "stft" in configs:
        from zorak_tpu.kernels.stft import stft_process

        x = jnp.asarray(rng.randn(n) * 0.25, jnp.float32)

        @jax.jit
        def run(a):
            def bins(spec):
                # f32 weights: an f64 gain would promote the spectrum to
                # c128, which the TPU f64-emulation pass can't convert
                w = jnp.linspace(0.5, 1.5, spec.shape[-1],
                                 dtype=jnp.float32)
                return spec * w
            return stft_process(a, bins, size=2048, hop=512)

        log("stft: compiling")
        rtx = timed_rtx(lambda: run(x), secs)
        emit("stft2048_overlap_add", rtx)

    if "denoiser" in configs:
        from zorak_tpu.kernels.stft import spectral_gate

        x = jnp.asarray(rng.randn(n) * 0.02, jnp.float32)
        log("denoiser: compiling")
        rtx = timed_rtx(lambda: spectral_gate(x, size=2048), secs)
        emit("restoration_spectral_gate", rtx)

    if "convolution" in configs:
        from zorak_tpu.kernels.convolution import partitioned_convolve

        x = jnp.asarray(rng.randn(n) * 0.25, jnp.float32)
        k = 131072  # ~2.7s IR
        ir = jnp.asarray(rng.randn(k) * np.exp(-np.arange(k) / (k / 5)),
                         jnp.float32)
        log("convolution: compiling")
        rtx = timed_rtx(lambda: partitioned_convolve(x, ir, part_size=2048),
                        secs)
        emit("partitioned_convolution_131072tap", rtx)

    if "catalog" in configs:
        from zorak_tpu.parallel import build_catalog_renderers, \
            catalog_batch_render

        short = int(min(secs, 30.0) * srate)
        # sequential-scan-bound plugins (uncoupled kernels with per-SCC
        # scans, e.g. ADS at ~13.5x realtime on-device) blow the remote
        # execution deadline at 30 s inputs — the dispatch dies
        # 'UNAVAILABLE: TPU device error' and wedges the chip (round-4
        # post-mortem; see bench.py _section_catalog).  They sweep 2 s.
        short_seq = int(min(secs, 2.0) * srate)
        x = (rng.randn(2, short) * 0.25).astype(np.float32)
        log("catalog: specializing kernels")
        renderers, skipped = build_catalog_renderers(args.catalog,
                                                     segment_len=1 << 16)

        def _n_for(r):
            kern = getattr(r, "kernel", None)
            if kern is not None and not kern.coupled \
                    and getattr(kern, "scan_groups", ()):
                return short_seq
            return short

        log("catalog: compiling (warmup render)")
        staged = {}
        for slug, r in renderers.items():
            n_i = _n_for(r)
            log(f"catalog: warmup {slug} ({n_i / srate:.0f}s)")
            xi = x[None, : r.nch, :n_i] if x.shape[0] >= r.nch else \
                np.broadcast_to(x[None, :1, :n_i], (1, r.nch, n_i))
            xd = jax.device_put(np.ascontiguousarray(xi))
            jax.block_until_ready(r.render_files(xd))
            staged[slug] = (r, xd, n_i)
        # timed pass: kernels specialized AND compiled; render only
        log("catalog: timed render")
        t0 = time.perf_counter()
        outs = {slug: r.render_files(xd) for slug, (r, xd, _n) in
                staged.items()}
        jax.block_until_ready(list(outs.values()))
        wall = time.perf_counter() - t0
        total_audio = sum(n for _r, _x, n in staged.values()) / srate
        emit("catalog_sweep", total_audio / wall,
             {"plugins_vectorized": len(outs), "plugins_fallback": len(skipped),
              "audio_seconds": round(total_audio, 1)})

        # stacked: fuse plugin groups into single dispatches (the
        # sequential sweep pays per-dispatch tunnel latency per plugin).
        # Sequential-scan-bound plugins are EXCLUDED: one of them inside
        # a stacked program drags the whole dispatch past the execution
        # deadline and a killed dispatch wedges the device.
        from zorak_tpu.parallel import catalog_stacked_render

        stackable = {slug: r for slug, r in renderers.items()
                     if _n_for(r) == short}
        plan = {}
        log(f"catalog: stacked compile + warmup ({len(stackable)} "
            f"plugins; {len(renderers) - len(stackable)} seq-bound kept "
            "sequential)")
        outs, nd = catalog_stacked_render(stackable, x, plan=plan)
        jax.block_until_ready(list(outs.values()))
        log(f"catalog: stacked timed render ({nd} dispatches)")
        t0 = time.perf_counter()
        outs, nd = catalog_stacked_render(stackable, x, plan=plan)
        jax.block_until_ready(list(outs.values()))
        wall = time.perf_counter() - t0
        emit("catalog_sweep_stacked", len(outs) * short / srate / wall,
             {"plugins_vectorized": len(outs), "dispatches": nd})

    if "catalog_files" in configs:
        # BASELINE config 5: whole catalog x N files vmapped on one chip —
        # the files axis multiplies audio-seconds per dispatch, amortizing
        # tunnel latency AND filling the chip (independent lanes)
        from zorak_tpu.parallel import build_catalog_renderers

        F = int(args.files)
        short = int(min(secs, 30.0) * srate)
        xf = (rng.randn(F, 2, short) * 0.25).astype(np.float32)
        log(f"catalog_files: specializing ({F} files)")
        renderers, skipped = build_catalog_renderers(args.catalog,
                                                     segment_len=1 << 16)
        # heavy coupled pipelines stay out: per-file carries vmap but the
        # per-sample scan dominates and the F-fold compile is minutes each
        light = {s: r for s, r in renderers.items()
                 if not r.kernel.coupled and r.kernel._hop is None}
        log(f"catalog_files: warmup ({len(light)} plugins)")
        outs = {}
        for slug, r in light.items():
            xi = xf[:, : r.nch]
            outs[slug] = r.render_files(xi)
        jax.block_until_ready(list(outs.values()))
        log("catalog_files: timed render")
        t0 = time.perf_counter()
        for slug, r in light.items():
            outs[slug] = r.render_files(xf[:, : r.nch])
        jax.block_until_ready(list(outs.values()))
        wall = time.perf_counter() - t0
        emit("catalog_files_batch", len(light) * F * short / srate / wall,
             {"plugins": len(light), "files": F})

    if "coupled" in configs:
        # fused block/sample plugins at a larger host block (a host's
        # buffer-size choice; null-tested bit-exact at any B): fewer scan
        # steps per render
        from zorak_tpu.catalog import discover
        from zorak_tpu.lowering import specialize_sample_kernel
        from zorak_tpu.runtime.services import EngineHost
        from zorak_tpu.verify import make_initialized_shadow

        specs = {s.slug: s for s in discover(args.catalog)}
        xin = (rng.randn(2, n) * 0.25).astype(np.float32)
        for slug in ("DOT", "ERBTilt", "SpectralStabilizer"):
            for B in (512, 2048):
                prog = specs[slug].load_program()
                nch = max(1, prog.io_channels["process"])
                sh = make_initialized_shadow(prog, srate, host=EngineHost())
                log(f"coupled: {slug} B={B} specializing + compiling")
                kern = specialize_sample_kernel(prog, sh.state, nch,
                                                segment_len=1 << 16,
                                                block_size=B)
                xi = xin[:nch]
                rtx = timed_rtx(
                    lambda: kern.render_device(xi)[0], secs, runs=3)
                emit(f"coupled_{slug.lower()}_b{B}", rtx)

    return 0


if __name__ == "__main__":
    sys.exit(main())
