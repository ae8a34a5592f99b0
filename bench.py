#!/usr/bin/env python3
"""Benchmark: DDT (north-star config) 60 s 48 kHz stereo offline render.

Prints JSON lines to stdout; the LAST line is the artifact: {"metric",
"value", "unit", "vs_baseline", ...}.  value = realtime factor
(audio-seconds rendered per wall-second) on one chip; vs_baseline =
value / 1000 (the BASELINE.json north-star target of >=1000x realtime;
the reference itself publishes no numbers).

Robustness contract (round-2 post-mortem: BENCH_r02 recorded 0.0 because
the warmup crossed the timing deadline and the loop then did ZERO runs):
  * at least ONE timed DDT run always happens, deadline or not;
  * the JSON artifact line is re-emitted after every completed section,
    so a wedged device window costs one field, not the artifact;
  * suite configs are batched over lanes so compute per dispatch
    dominates tunnel dispatch latency at the worst observed placement
    (~50 ms/dispatch) — the number measures the framework, not the
    container's network placement.

Progress goes to stderr.  Audio stays on device; correctness is asserted
via on-device peak/finite reductions (the dev tunnel's device->host path
has a large one-time init cost and is not part of the render).
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

DDT_PATH = Path("/root/reference/plugins/Spatialization/DDT/src/DDT.jsfx")
SRATE = 48000.0
SEG = 1 << 17
N_SAMPLES = SEG * 22          # ~60.07 s; exact segment multiple
SECONDS = N_SAMPLES / SRATE
TARGET_RTX = 1000.0
T0 = time.time()

# mutable artifact state: emit() re-prints the full line after every
# completed section so the last stdout JSON line is always the best
# available snapshot even if the process dies mid-suite
ARTIFACT: dict = {"metric": "ddt_offline_render_rtx", "value": 0.0,
                  "unit": "x_realtime_48k_stereo", "vs_baseline": 0.0,
                  "engine": "tpu-vector", "audio_ok": None, "runs": 0,
                  "suite": {}}


def log(msg: str) -> None:
    print(f"[bench {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit() -> None:
    print(json.dumps(ARTIFACT), flush=True)


def set_value(value: float, runs: int) -> None:
    ARTIFACT["value"] = round(value, 1)
    ARTIFACT["vs_baseline"] = round(value / TARGET_RTX, 3)
    ARTIFACT["runs"] = runs


def wait_device_healthy(budget_s: float) -> bool:
    """Probe the chip with a tiny dispatch until it answers.

    A failed/killed remote compile (oversized program) can leave the
    device UNAVAILABLE for minutes — it recovers by itself.  Round-2's
    artifact lost the whole catalog section to one wedged window, so
    every section boundary re-probes instead of assuming health."""
    import jax
    import jax.numpy as jnp

    t_end = time.time() + budget_s
    while True:
        ok = {}

        def probe():
            try:
                x = jnp.full((8,), 3.0)
                ok["v"] = float(jax.block_until_ready(x.sum()))
            except Exception as exc:  # noqa: BLE001
                ok["err"] = str(exc)[:120]

        import threading
        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout=60.0)
        if ok.get("v") == 24.0:
            return True
        log(f"device probe failed ({ok.get('err', 'timeout')}); "
            f"waiting for recovery")
        if time.time() > t_end:
            return False
        time.sleep(30.0)


def run_suite_configs(budget_s: float) -> None:
    """BASELINE.json configs beyond DDT (stft / denoiser / convolution /
    catalog sweep), time-bounded; results ride in the bench artifact the
    driver records.  Compiles are served by the persistent cache.

    Placement robustness: the kernel configs batch B independent lanes
    into ONE dispatch (vmap), so per-dispatch compute is tens of ms and
    the recorded number is within ~2-3x across the 0.2 ms and 50 ms
    tunnel placements observed so far (CLAUDE.md round-2/3 notes)."""
    import jax
    import jax.numpy as jnp

    suite: dict = ARTIFACT["suite"]
    t_end = time.time() + budget_s
    srate = 48000.0
    n = int(20.0 * srate)
    lanes = 32          # batched lanes per dispatch (placement robustness)
    rng = np.random.RandomState(11)

    def timed(fn, audio_seconds, runs=3):
        jax.block_until_ready(fn())
        best = 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = max(best, audio_seconds / (time.perf_counter() - t0))
        return round(best, 1)

    def section(name):
        """Per-section fault isolation: one failed/oversized compile must
        not abort the remaining sections (round-3 post-mortem: the
        convolution OOM ate the catalog sweep)."""
        def deco(fn):
            if time.time() >= t_end:
                return
            try:
                fn()
            except Exception as exc:  # noqa: BLE001
                suite[name + "_error"] = f"{type(exc).__name__}: " \
                                         f"{str(exc)[:300]}"
                log(f"suite {name} failed: {suite[name + '_error']}")
                wait_device_healthy(min(300.0, max(0.0, t_end - time.time())))
            emit()
        return deco

    @section("stft")
    def _stft():
        from zorak_tpu.kernels.stft import stft_process

        # f32 inputs: the kernel pipelines are f32/c64 end-to-end
        # (TPU f64 is emulated at ~30x cost and buys nothing at the
        # 1e-5 f32-rounded audio contract)
        xb = jnp.asarray(rng.randn(lanes, n) * 0.25, jnp.float32)

        @jax.jit
        def run_stft(a):
            def bins(spec):
                w = jnp.linspace(0.5, 1.5, spec.shape[-1],
                                 dtype=jnp.float32)
                return spec * w
            return jax.vmap(
                lambda ch: stft_process(ch, bins, size=2048, hop=512))(a)

        suite["stft2048_overlap_add_rtx"] = timed(
            lambda: run_stft(xb), lanes * n / srate)
        log(f"suite stft: {suite['stft2048_overlap_add_rtx']}x "
            f"({lanes} lanes)")

    @section("denoiser")
    def _denoiser():
        from zorak_tpu.kernels.stft import spectral_gate

        xq = jnp.asarray(rng.randn(lanes, n) * 0.02, jnp.float32)
        gate = jax.jit(jax.vmap(
            lambda ch: spectral_gate(ch, size=2048)))
        suite["restoration_spectral_gate_rtx"] = timed(
            lambda: gate(xq), lanes * n / srate)
        log(f"suite denoiser: {suite['restoration_spectral_gate_rtx']}x")

    @section("convolution")
    def _convolution():
        from zorak_tpu.kernels.convolution import partitioned_convolve

        xb = jnp.asarray(rng.randn(lanes, n) * 0.25, jnp.float32)
        k = 131072
        ir = jnp.asarray(rng.randn(k) * np.exp(-np.arange(k) / (k / 5)),
                         jnp.float32)
        conv = jax.jit(jax.vmap(
            lambda ch: partitioned_convolve(ch, ir, part_size=2048)))
        suite["partitioned_convolution_131072tap_rtx"] = timed(
            lambda: conv(xb), lanes * n / srate)
        log("suite convolution: "
            f"{suite['partitioned_convolution_131072tap_rtx']}x")

    try:
        if time.time() < t_end:
            from zorak_tpu.parallel import build_catalog_renderers

            wait_device_healthy(min(300.0, max(0.0, t_end - time.time())))

            # 30 s per plugin: the sweep wall is tunnel dispatch + host
            # overhead (near T-independent once staged on device), so a
            # longer input raises aggregate audio-seconds ~linearly.
            # Plugins render SEQUENTIALLY (one single-plugin program
            # each): multi-plugin stacked programs at this T exceed the
            # remote TPU compiler's memory cap, and a SIGKILLed compile
            # wedges the device for many minutes (it ate two artifacts).
            short = int(30.0 * srate)
            xc = (rng.randn(2, short) * 0.25).astype(np.float32)
            log("suite catalog: specializing")
            renderers, skipped = build_catalog_renderers(
                "/root/reference", segment_len=1 << 16)
            # per-plugin warmup with a clock check: a cold compile cache
            # must not blow the artifact deadline — plugins warmed in
            # time are measured, the rest reported
            warmed: dict = {}
            for slug, r in renderers.items():
                if time.time() > t_end:
                    break
                xi = xc[None, : r.nch] if xc.shape[0] >= r.nch else \
                    np.broadcast_to(xc[None, :1], (1, r.nch, short))
                xi = np.ascontiguousarray(xi)
                # one retry: the tunnel's remote compile server
                # occasionally drops mid-compile and recovers; compiles
                # are banked in the persistent cache either way
                for attempt in (0, 1):
                    try:
                        # stage the input on device ONCE: render_files
                        # skips conversion for jax.Arrays, so the timed
                        # sweep pays no per-plugin H2D upload (~11 MB per
                        # plugin over the dev tunnel otherwise dominates)
                        xd = jax.device_put(xi)
                        jax.block_until_ready(r.render_files(xd))
                        warmed[slug] = (r, xd)
                        break
                    except Exception as exc:  # noqa: BLE001
                        log(f"suite catalog: {slug} failed: "
                            f"{str(exc)[:160]}")
                        if attempt or time.time() > t_end:
                            break
                        if "UNAVAILABLE" in str(exc) \
                                or "device error" in str(exc):
                            wait_device_healthy(
                                max(0.0, t_end - time.time()))
                        else:
                            time.sleep(30.0)
            if warmed:
                t0 = time.perf_counter()
                outs = [r.render_files(xi) for r, xi in warmed.values()]
                jax.block_until_ready(outs)
                wall = time.perf_counter() - t0
                suite["catalog_sweep_rtx"] = round(
                    len(warmed) * short / srate / wall, 1)
                suite["catalog_plugins_vectorized"] = len(warmed)
                suite["catalog_plugins_total"] = len(renderers)
                log(f"suite catalog: {suite['catalog_sweep_rtx']}x "
                    f"({len(warmed)}/{len(renderers)} plugins)")
                emit()
    except Exception as exc:  # noqa: BLE001 — partial suite beats no suite
        suite["error"] = f"{type(exc).__name__}: {exc}"
        log(f"suite aborted: {suite['error']}")
        emit()


def main() -> int:
    import jax
    import jax.numpy as jnp

    from zorak_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from zorak_tpu.ir import load_plugin_file
    from zorak_tpu.lowering import specialize_sample_kernel
    from zorak_tpu.verify import make_initialized_shadow

    if not DDT_PATH.exists():
        ARTIFACT["error"] = f"missing {DDT_PATH}"
        emit()
        return 1

    log(f"devices: {jax.devices()}")
    # the axon tunnel backend can fail init transiently (e.g. a prior
    # client's connection still draining) and jax then SILENTLY falls
    # back to CPU — which would record garbage numbers.  Fail loudly so
    # the caller retries; ZORAK_BENCH_ALLOW_CPU=1 opts into CPU runs.
    if jax.default_backend() != "tpu" \
            and not os.environ.get("ZORAK_BENCH_ALLOW_CPU"):
        log(f"FATAL: backend is {jax.default_backend()}, not tpu; "
            "refusing to bench on fallback hardware (exit 3)")
        return 3
    wait_device_healthy(300.0)
    program = load_plugin_file(DDT_PATH)
    shadow = make_initialized_shadow(program, SRATE)
    kern = specialize_sample_kernel(program, shadow.state, 2, segment_len=SEG)
    log("specialized DDT")

    rng = np.random.RandomState(11)
    # staged on device ONCE: H2D on the dev tunnel runs ~75 MB/s at bad
    # placements — a 23 MB per-render re-upload would dominate the render
    # (round-3 post-mortem: 85x instead of >10,000x).  render_device
    # passes jax.Array inputs through untouched.
    x = jax.device_put((rng.randn(2, N_SAMPLES) * 0.25).astype(np.float32))
    jax.block_until_ready(x)

    # stats computed on device; only 3 scalars cross the link
    stats_fn = jax.jit(lambda a: (jnp.max(jnp.abs(a)),
                                  jnp.sum(jnp.isfinite(a)),
                                  jnp.sum(jnp.abs(a))))

    y, carry = kern.render_device(x)
    jax.block_until_ready((y, carry))
    log("render pipeline compiled + first run done")

    # time FIRST (block_until_ready syncs execution without any D2H — the
    # tunnel's device->host path can stall independently of compute).
    # INVARIANT: run #1 always happens — a slow compile must never zero
    # the artifact again (round-2 post-mortem).  The deadline anchors to
    # NOW, not T0: startup device-recovery probes must not eat the
    # timing window (runs cost <1 s each once compiled).
    deadline = max(T0 + 420.0, time.time() + 45.0)
    best = 0.0
    runs = 0
    while runs < 1 or (runs < 5 and time.time() < deadline):
        t0 = time.perf_counter()
        y, carry = kern.render_device(x)
        jax.block_until_ready((y, carry))
        dt = time.perf_counter() - t0
        best = max(best, SECONDS / dt)
        runs += 1
        log(f"run {runs}: {dt * 1000:.1f} ms -> {SECONDS / dt:.0f}x realtime")

    set_value(best, runs)
    emit()    # artifact now carries a real DDT number whatever happens next

    # validate audio afterwards, with a bounded wait on the D2H fetch
    stats = stats_fn(y)
    jax.block_until_ready(stats)
    log("stats computed on device; fetching 3 scalars")
    result = {}

    def fetch():
        try:
            peak, nfinite, total = (float(v) for v in stats)
            result["peak"] = peak
            result["ok"] = (nfinite == y.size) and peak > 1e-6
        except Exception as exc:  # noqa: BLE001
            result["err"] = str(exc)

    import threading
    th = threading.Thread(target=fetch, daemon=True)
    th.start()
    th.join(timeout=max(10.0, (T0 + 540.0) - time.time()))

    if "ok" in result:
        log(f"audio check: peak={result['peak']:.4f} ok={result['ok']}")
        ARTIFACT["audio_ok"] = bool(result["ok"])
    else:
        log("audio stats fetch timed out (tunnel D2H); compute validated "
            "separately by the null-test suite")
        ARTIFACT["audio_ok"] = None
    emit()

    # remaining BASELINE configs, bounded so the artifact lands on time.
    # ZORAK_BENCH_DEADLINE_S widens the window for cache-banking warmup
    # runs (a cold container pays ~1 h of remote catalog compiles; they
    # persist in the compile cache for the driver's official run).
    deadline_s = float(os.environ.get("ZORAK_BENCH_DEADLINE_S", "1500"))
    run_suite_configs(budget_s=max(0.0, (T0 + deadline_s) - time.time()))

    emit()
    sys.stdout.flush()
    sys.stderr.flush()
    # a stuck D2H fetch thread must not abort interpreter teardown
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
