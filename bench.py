#!/usr/bin/env python3
"""Benchmark: DDT (north-star config) 60 s 48 kHz stereo offline render.

Prints JSON lines to stdout; the LAST line is the artifact: {"metric",
"value", "unit", "vs_baseline", ...}.  value = realtime factor
(audio-seconds rendered per wall-second) on one chip; vs_baseline =
value / 1000 (the BASELINE.json north-star target of >=1000x realtime;
the reference itself publishes no numbers).

Robustness contract (round-2/3 post-mortems):
  * at least ONE timed DDT run always happens, deadline or not — and the
    timing deadline anchors to pipeline-ready time, not process start;
  * the JSON artifact line is re-emitted after every completed section,
    so a wedged device window costs one field, not the artifact;
  * every suite section runs in its OWN SUBPROCESS with a fresh tunnel
    client: once a process's axon client wedges ("TPU device error"), it
    never recovers in-process — a fresh process minutes later works.
    Observed wedge trigger: a multi-minute 100%-CPU phase (catalog
    specialization) starving the tunnel session on this 1-core box;
  * suite kernel configs are batched over lanes so compute per dispatch
    dominates tunnel dispatch latency at the worst observed placement
    (~50 ms/dispatch) — the number measures the framework, not the
    container's network placement.

Progress goes to stderr.  Audio stays on device; correctness is asserted
via on-device peak/finite reductions (the dev tunnel's device->host path
has a large one-time init cost and is not part of the render).
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

DDT_PATH = Path("/root/reference/plugins/Spatialization/DDT/src/DDT.jsfx")
SRATE = 48000.0
# 8 segments of ~7.5 s won the fetch-forced segment sweep once linrecs
# solve as batched doubling scans (1 seg 677x / 2 segs 832x / 4 segs
# 1255x / 8 segs 1381x at the slow round-3 placement): fewer segments
# cut stage launches but grow each O(M+L) ring materialization; 8 is
# the knee.  The doubling form keeps the big-segment compile tractable.
SEG = (1 << 15) * 11
N_SAMPLES = SEG * 8           # ~60.07 s; exact segment multiple
SECONDS = N_SAMPLES / SRATE
TARGET_RTX = 1000.0
T0 = time.time()

# mutable artifact state: emit() re-prints the full line after every
# completed section so the last stdout JSON line is always the best
# available snapshot even if the process dies mid-suite
ARTIFACT: dict = {"metric": "ddt_offline_render_rtx", "value": 0.0,
                  "unit": "x_realtime_48k_stereo", "vs_baseline": 0.0,
                  "engine": "tpu-vector", "audio_ok": None, "runs": 0,
                  "dispatch_ms": None, "suite": {}}


def log(msg: str) -> None:
    print(f"[bench {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit() -> None:
    print(json.dumps(ARTIFACT), flush=True)


def set_value(value: float, runs: int) -> None:
    ARTIFACT["value"] = round(value, 1)
    ARTIFACT["vs_baseline"] = round(value / TARGET_RTX, 3)
    ARTIFACT["runs"] = runs


def measure_dispatch_ms(n: int = 15) -> float:
    """Median round-trip of a trivial dispatch + scalar fetch.

    Recorded next to every RT× figure so tunnel-placement variance
    (round-1 saw ~0.2-1 ms effective dispatches, round-3 ~10-50 ms —
    a 10x swing on latency-bound configs) is attributable: a number
    that moved WITH dispatch_ms is placement, one that moved without
    it is a real regression.  Each iteration chains y = f(y) so the
    (executable, buffers) pair is fresh (identical pairs return in
    ~0.3 ms without executing — round-3 post-mortem)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    y = jnp.zeros((8,), jnp.float32)
    y = f(y)
    _ = float(y[0])                      # warm compile + D2H path
    times = []
    for _i in range(n):
        t0 = time.perf_counter()
        y = f(y)
        _ = float(y[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return round(times[len(times) // 2] * 1000.0, 3)


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
        # INLINE, no probe thread: the old 60s-join version ABANDONED a
        # probe still blocked in the first D2H init (which takes 1-3 min
        # on a fresh process) and then spawned more probes — and later
        # real work — while the zombies were still mid-dispatch.
        # Concurrent tunnel operations from abandoned threads are what
        # poisoned the session into the round-3/4 'UNAVAILABLE: TPU
        # device error' cascades that lost every catalog window.  A probe
        # that blocks for minutes here just spends the budget it was
        # given; the section subprocess timeout is the backstop.
        try:
            x = jnp.full((8,), 3.0)
            if float(jax.block_until_ready(x.sum())) == 24.0:
                return True
            log("device probe returned a wrong value; retrying")
        except Exception as exc:  # noqa: BLE001
            log(f"device probe failed ({str(exc)[:120]}); "
                f"waiting for recovery")
        if time.time() > t_end:
            return False
        time.sleep(30.0)


# -- suite sections (each runs in its own subprocess) -------------------------

_LANES = 32          # batched lanes per dispatch (placement robustness)
_KERNEL_SECONDS = 20.0


def _timed(fn, audio_seconds, runs=3):
    import jax

    jax.block_until_ready(fn())
    best = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = max(best, audio_seconds / (time.perf_counter() - t0))
    return round(best, 1)


def _section_stft(budget_s: float) -> dict:
    import jax
    import jax.numpy as jnp

    from zorak_tpu.kernels.stft import stft_process

    # f32 inputs: the kernel pipelines are f32/c64 end-to-end (TPU f64 is
    # emulated at ~30x cost and buys nothing at the 1e-5 audio contract)
    n = int(_KERNEL_SECONDS * SRATE)
    rng = np.random.RandomState(11)
    xb = jnp.asarray(rng.randn(_LANES, n) * 0.25, jnp.float32)

    @jax.jit
    def run_stft(a):
        def bins(spec):
            w = jnp.linspace(0.5, 1.5, spec.shape[-1], dtype=jnp.float32)
            return spec * w
        return jax.vmap(
            lambda ch: stft_process(ch, bins, size=2048, hop=512))(a)

    return {"stft2048_overlap_add_rtx":
            _timed(lambda: run_stft(xb), _LANES * n / SRATE)}


def _section_denoiser(budget_s: float) -> dict:
    import jax
    import jax.numpy as jnp

    from zorak_tpu.kernels.stft import spectral_gate

    n = int(_KERNEL_SECONDS * SRATE)
    rng = np.random.RandomState(11)
    xq = jnp.asarray(rng.randn(_LANES, n) * 0.02, jnp.float32)
    gate = jax.jit(jax.vmap(lambda ch: spectral_gate(ch, size=2048)))
    return {"restoration_spectral_gate_rtx":
            _timed(lambda: gate(xq), _LANES * n / SRATE)}


def _section_convolution(budget_s: float) -> dict:
    import jax
    import jax.numpy as jnp

    from zorak_tpu.kernels.convolution import partitioned_convolve

    n = int(_KERNEL_SECONDS * SRATE)
    rng = np.random.RandomState(11)
    xb = jnp.asarray(rng.randn(_LANES, n) * 0.25, jnp.float32)
    k = 131072
    ir = jnp.asarray(rng.randn(k) * np.exp(-np.arange(k) / (k / 5)),
                     jnp.float32)
    conv = jax.jit(jax.vmap(
        lambda ch: partitioned_convolve(ch, ir, part_size=2048)))
    return {"partitioned_convolution_131072tap_rtx":
            _timed(lambda: conv(xb), _LANES * n / SRATE)}


def _section_catalog(budget_s: float) -> dict:
    import jax

    from zorak_tpu.parallel import build_catalog_renderers

    t_end = time.time() + budget_s
    out: dict = {}
    # 30 s per plugin: the sweep wall is tunnel dispatch + host overhead
    # (near T-independent once staged on device), so a longer input
    # raises aggregate audio-seconds ~linearly.  Plugins render
    # SEQUENTIALLY (one single-plugin program each): multi-plugin
    # stacked programs at this T exceed the remote TPU compiler's memory
    # cap, and a SIGKILLed compile wedges the device for many minutes.
    short = int(float(os.environ.get("ZORAK_CATALOG_SECONDS", "30"))
                * SRATE)
    # sequential-scan-bound plugins (uncoupled kernels carrying per-SCC
    # lax.scans) run ~4-5 s of DEVICE time per 65536-sample segment (ADS
    # measured 13.5x realtime): a 30 s input blows the remote execution
    # deadline (~60-90 s), the dispatch dies 'UNAVAILABLE: TPU device
    # error' and WEDGES the chip — the round-3/4 catalog killer.  They
    # sweep a short input instead; the aggregate RT× is audio-seconds
    # over wall either way.
    short_seq = int(float(os.environ.get("ZORAK_CATALOG_SECONDS_SEQ",
                                         "2")) * SRATE)
    rng = np.random.RandomState(11)
    xc = (rng.randn(2, short) * 0.25).astype(np.float32)
    # specialize BEFORE the first device dispatch: the multi-minute
    # 100%-CPU specialization phase starves an ACTIVE tunnel session
    # into the wedged "TPU device error" state (round-2/3 post-mortems).
    # The health probe runs CONCURRENTLY in a thread — it is network-
    # bound (the first D2H fetch of a child process can take minutes at
    # bad placements), and serializing it after the 2-3 min CPU phase
    # ate the whole round-3 budget before one plugin warmed.
    log("suite catalog: specializing (serial probe after)")
    renderers, skipped = build_catalog_renderers(
        "/root/reference", segment_len=1 << 16)
    # ONE bounded SERIAL probe after the 100%-CPU specialization phase.
    # Round 3 made this a concurrent thread (the serial pre-specialize
    # probe had eaten the budget) — and the catalog then died to an
    # instant 'UNAVAILABLE: TPU device error' cascade in EVERY round-3/4
    # window: two threads issuing tunnel operations on one client poison
    # the session.  Everything here is single-threaded now; the probe
    # doubles as the D2H warmup for the final fetch-forced sweep.
    probed_ok = wait_device_healthy(180.0)
    log(f"suite catalog: serial probe {'ok' if probed_ok else 'timed out'}")
    log(f"suite catalog: specialized {len(renderers)} "
        f"(skipped {len(skipped)}); warming (H2D+compute need no D2H)")
    # per-plugin warmup with a clock check: a cold compile cache must not
    # blow the artifact deadline — plugins warmed in time are measured.
    # INVARIANT: the first MIN_WARM plugins warm regardless of the clock
    # (round-3 post-mortem: a slow probe left the section empty; a small
    # late number beats none), and each warmup updates the result line so
    # a later wedge costs the tail, not the section.
    MIN_WARM = 3
    warmed: dict = {}
    consec_err = 0
    # an early progress marker: even a fully-wedged window then leaves a
    # salvageable JSON line (round-4 post-mortem: a device erroring from
    # warmup start printed NOTHING, so the parent salvaged None)
    out["catalog_plugins_total"] = len(renderers)
    out["catalog_plugins_vectorized"] = 0
    print(json.dumps(out), flush=True)
    for slug, r in renderers.items():
        if time.time() > t_end and len(warmed) >= MIN_WARM:
            log(f"suite catalog: budget exhausted after {len(warmed)}")
            break
        if time.time() > t_end + 180.0:
            # hard stop EVEN with nothing warmed: returning a partial
            # result beats being killed by the parent's child timeout
            log(f"suite catalog: hard deadline ({len(warmed)} warmed)")
            break
        kern = getattr(r, "kernel", None)
        seq_bound = bool(kern is not None and not kern.coupled
                         and getattr(kern, "scan_groups", ()))
        n_i = short_seq if seq_bound else short
        log(f"suite catalog: warming {slug} "
            f"({len(warmed)} done, {t_end - time.time():.0f}s left, "
            f"{n_i / SRATE:.0f}s{' seq' if seq_bound else ''})")
        xi = xc[None, : r.nch, :n_i] if xc.shape[0] >= r.nch else \
            np.broadcast_to(xc[None, :1, :n_i], (1, r.nch, n_i))
        xi = np.ascontiguousarray(xi)
        # one retry: the tunnel's remote compile server occasionally
        # drops mid-compile and recovers; compiles are banked in the
        # persistent cache either way
        for attempt in (0, 1):
            try:
                # stage the input on device ONCE: render_files skips
                # conversion for jax.Arrays, so the timed sweep pays no
                # per-plugin H2D upload (~11 MB over the dev tunnel)
                xd = jax.device_put(xi)
                jax.block_until_ready(r.render_files(xd))
                warmed[slug] = (r, xd, n_i)
                consec_err = 0
                break
            except Exception as exc:  # noqa: BLE001
                consec_err += 1
                log(f"suite catalog: {slug} failed: {str(exc)[:160]}")
                if attempt or (time.time() > t_end
                               and len(warmed) >= MIN_WARM):
                    break
                if "UNAVAILABLE" in str(exc) or "device error" in str(exc):
                    # BOUNDED recovery wait: waiting out the whole budget
                    # on one plugin starves the rest of the sweep — the
                    # device often recovers mid-section, and later
                    # plugins then still warm (round-4 post-mortem)
                    wait_device_healthy(
                        min(120.0, max(15.0, t_end - time.time())))
                else:
                    time.sleep(min(30.0, max(5.0, t_end - time.time())))
        if consec_err >= 8 and not warmed:
            # a poisoned device handle never recovers within one client:
            # bail with the partial result so the parent's fresh-process
            # retry (new tunnel session) gets the remaining budget
            log("suite catalog: device persistently erroring, nothing "
                "warmed — bailing early for the fresh-process retry")
            break
        if len(warmed) in (1, MIN_WARM) or (warmed and len(warmed) % 6 == 0):
            # incremental safety-net sweeps: no fetch (each fetch-forced
            # sweep costs a cold remote compile of its reduce)
            _catalog_sweep(warmed, len(renderers), out,
                           fetch_ok=False)

    if warmed:
        # one more bounded serial probe if the first timed out, so the
        # final sweep can use fetch-forced completion (honest timing)
        if not probed_ok:
            probed_ok = wait_device_healthy(
                max(0.0, min(120.0, t_end - time.time())))
        _catalog_sweep(warmed, len(renderers), out,
                       fetch_ok=probed_ok, per_plugin=True)
    return out


def _catalog_sweep(warmed: dict, total: int, out: dict,
                   fetch_ok: bool = False, per_plugin: bool = False) -> None:
    """Timed sweep over the plugins warmed SO FAR; prints the result line
    so a later wedge costs only the un-swept tail.  Input lengths are
    PER-PLUGIN (sequential-scan-bound plugins sweep shorter inputs, see
    _section_catalog); the aggregate RT× is total audio seconds rendered
    over wall, which stays honest across mixed lengths.

    fetch_ok: when the D2H path is warmed, force completion by fetching a
    scalar reduced from every output (block_until_ready alone does not
    reliably sync over the tunnel).

    per_plugin: ALSO time each plugin's render individually and emit a
    {slug: rtx} map — the blended aggregate buries the 1000x-class
    vector plugins under the sequential-scan-bound plugins' device time
    (round-4 verdict), so the artifact must show the distribution."""
    import jax
    import jax.numpy as jnp

    if fetch_ok:
        # ONE jitted reduce over all outputs (eager per-op dispatch over
        # the tunnel costs ~seconds each); compiled UNTIMED on the warm
        # outputs first, then the timed sweep pays one dispatch + one
        # scalar fetch
        reduce_fn = jax.jit(
            lambda os: sum(jnp.abs(o[..., -4:]).sum() for o in os))
        outs = [r.render_files(xi) for r, xi, _n in warmed.values()]
        _ = float(reduce_fn(outs))
    t0 = time.perf_counter()
    outs = [r.render_files(xi) for r, xi, _n in warmed.values()]
    if fetch_ok:
        s = float(reduce_fn(outs))
    else:
        s = None
        jax.block_until_ready(outs)
    wall = time.perf_counter() - t0
    audio_s = sum(n for _r, _x, n in warmed.values()) / SRATE
    out["catalog_sweep_rtx"] = round(audio_s / wall, 1)
    out["catalog_audio_seconds"] = round(audio_s, 1)
    out["catalog_plugins_vectorized"] = len(warmed)
    out["catalog_plugins_total"] = total
    out["catalog_fetch_forced"] = bool(fetch_ok)
    log(f"suite catalog: {out['catalog_sweep_rtx']}x "
        f"({len(warmed)}/{total} plugins, {audio_s:.0f}s audio, "
        f"fetch_forced={fetch_ok}, s={s})")
    print(json.dumps(out), flush=True)
    if per_plugin:
        _catalog_per_plugin(warmed, out, fetch_ok)


def _catalog_per_plugin(warmed: dict, out: dict, fetch_ok: bool) -> None:
    """Per-plugin RT×: one timed dispatch each, completion forced by a
    scalar fetch when the D2H path is up (one tiny jitted reduce per
    output shape, compiled untimed and banked)."""
    import jax
    import jax.numpy as jnp

    reduces: dict = {}

    def sync(o):
        if not fetch_ok:
            jax.block_until_ready(o)
            return
        shape = tuple(o.shape)
        fn = reduces.get(shape)
        if fn is None:
            fn = jax.jit(lambda a: jnp.abs(a[..., -4:]).sum())
            reduces[shape] = fn
            _ = float(fn(o))     # compile untimed
        _ = float(fn(o))

    per: dict = {}
    for slug, (r, xi, n_i) in warmed.items():
        try:
            sync(r.render_files(xi))        # warm this plugin's reduce
            t0 = time.perf_counter()
            sync(r.render_files(xi))
            dt = time.perf_counter() - t0
            per[slug] = round(n_i / SRATE / dt, 1)
        except Exception as exc:  # noqa: BLE001
            log(f"suite catalog: per-plugin {slug} failed: "
                f"{str(exc)[:120]}")
            per[slug] = None
        out["catalog_rtx_per_plugin"] = per
        print(json.dumps(out), flush=True)
    log(f"suite catalog per-plugin: {per}")


# catalog runs FIRST: it is the most wedge-prone section (per-plugin
# compile storms) and was lost to a late wedge two rounds running when it
# inherited whatever device state the kernel sections left behind
# (round-3 post-mortem; BASELINE.md north-star config 5)
_SECTIONS = {
    # catalog first (it is the fragile section) with the lion's share of
    # the 3300 s deadline: once stft/denoiser/convolution are warm they
    # take ~90 s each, so a 1800 s catalog cap still leaves all four
    # sections inside the window (run_suite_configs clamps each cap to
    # the remaining budget either way)
    "catalog": (_section_catalog, 1800.0),
    "stft": (_section_stft, 300.0),
    "denoiser": (_section_denoiser, 300.0),
    "convolution": (_section_convolution, 300.0),
}

# the five BASELINE.json north-star configs (DDT is the top-level value);
# an artifact field that a wedged window lost is carried forward from the
# newest prior round's artifact, tagged stale — four rounds produced no
# artifact holding all five simultaneously because each round's failure
# mode silently dropped a different subset (round-4 verdict)
_NORTH_STAR_KEYS = (
    "stft2048_overlap_add_rtx", "restoration_spectral_gate_rtx",
    "partitioned_convolution_131072tap_rtx", "catalog_sweep_rtx")


def _fill_stale(suite: dict) -> None:
    """Fill missing north-star fields from prior BENCH_r*.json artifacts,
    tagging provenance in suite['stale_from'].  run_suite_configs clears
    a key's tag the moment a section delivers a real value for it, so
    tags always describe exactly the carried numbers."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    stale: dict = dict(suite.get("stale_from", {}))
    missing = [k for k in _NORTH_STAR_KEYS if suite.get(k) is None]
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       reverse=True):
        if not missing:
            break
        try:
            with open(path) as f:
                parsed = (json.load(f) or {}).get("parsed") or {}
        except Exception:  # noqa: BLE001
            continue
        s = parsed.get("suite") or {}
        for k in list(missing):
            if s.get(k) is not None:
                suite[k] = s[k]
                stale[k] = os.path.basename(path)
                missing.remove(k)
    if stale:
        suite["stale_from"] = stale
    else:
        suite.pop("stale_from", None)


def _section_child(name: str, budget_s: float) -> int:
    """Child-process entry: run ONE section, print its result dict as the
    last stdout JSON line."""
    import jax

    from zorak_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    if jax.default_backend() != "tpu" \
            and not os.environ.get("ZORAK_BENCH_ALLOW_CPU"):
        log(f"FATAL: backend is {jax.default_backend()}, not tpu (exit 3)")
        return 3
    if name != "catalog":
        # catalog probes AFTER its CPU-heavy specialization instead
        wait_device_healthy(min(240.0, budget_s))
    fn, _ = _SECTIONS[name]
    result = fn(budget_s)
    print(json.dumps(result), flush=True)
    # a wedged probe thread must not block interpreter teardown
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _last_json_line(raw: bytes):
    last = None
    for line in (raw or b"").decode(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                pass
    return last


def _spawn_section(name: str, child_budget: float):
    """Run one suite section in a fresh subprocess.  Returns (rc, result):
    a dict result is salvaged from the child's LAST stdout JSON line even
    when the child dies or times out — the catalog section emits
    incremental sweep lines exactly so a late wedge costs the un-swept
    tail, not the whole field (round-3 post-mortem)."""
    log(f"suite {name}: spawning (budget {child_budget:.0f}s)")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--section", name, f"{child_budget:.0f}"],
            stdout=subprocess.PIPE, stderr=None,
            timeout=child_budget + 240.0, cwd=os.path.dirname(
                os.path.abspath(__file__)))
        return r.returncode, _last_json_line(r.stdout)
    except subprocess.TimeoutExpired as exc:
        log(f"suite {name}: child timed out; killed")
        return "timeout", _last_json_line(exc.stdout)
    except Exception as exc:  # noqa: BLE001
        log(f"suite {name} spawn failed: {exc}")
        return f"{type(exc).__name__}: {str(exc)[:200]}", None


def run_suite_configs(budget_s: float) -> None:
    """BASELINE.json configs beyond DDT, each in a fresh subprocess."""
    suite: dict = ARTIFACT["suite"]
    t_end = time.time() + budget_s
    for name, (fn, cap) in _SECTIONS.items():
        remaining = t_end - time.time()
        if remaining < 60.0:
            log(f"suite {name}: skipped (out of budget)")
            break
        rc, result = _spawn_section(name, min(cap, remaining))
        if isinstance(result, dict) and result:
            suite.update(result)   # partial beats none
            for k in result:
                # a real value replaces any stale carry-forward
                suite.get("stale_from", {}).pop(k, None)
            if not suite.get("stale_from"):
                suite.pop("stale_from", None)
        if rc != 0 or not result:
            suite[name + "_error"] = f"child exit {rc}, result {result!r}"
            log(f"suite {name} failed: {suite[name + '_error']}")
        elif name + "_error" in suite:
            del suite[name + "_error"]
        # every emitted snapshot holds the best-available five configs:
        # a driver-side kill mid-suite then still leaves a complete
        # artifact (missing fields carried from prior rounds, tagged)
        _fill_stale(suite)
        emit()
        # the catalog number was lost to a wedged window THREE rounds
        # running: when it died without a sweep figure, retry ONCE in a
        # fresh process after a recovery wait (fresh tunnel client).
        # The retry is UNCONDITIONAL on remaining budget and may overrun
        # the suite deadline by up to ~10 min — the catalog sweep is the
        # BASELINE north-star field; a late number beats a missing one.
        if name == "catalog" and "catalog_sweep_rtx" not in suite:
            log("suite catalog: no sweep figure — waiting 120s, then "
                "retrying in a fresh process")
            time.sleep(120.0)
            rc, result = _spawn_section(
                "catalog", max(480.0, min(cap, t_end - time.time())))
            if isinstance(result, dict) and result:
                suite.update(result)
                for k in result:
                    suite.get("stale_from", {}).pop(k, None)
                if "catalog_sweep_rtx" in suite:
                    suite.pop("catalog_error", None)
            _fill_stale(suite)
            emit()


def _ddt_batched(program, gen_fn, nb: int = 8) -> None:
    """vmap nb independent 60 s DDT renders into one dispatch; report
    audio-seconds rendered per wall second per chip.  Compile is banked
    persistently, so only the first container run pays it."""
    import jax
    import jax.numpy as jnp

    from zorak_tpu.parallel import BatchRenderer

    t0 = time.time()
    br = BatchRenderer(program, SRATE, segment_len=SEG)
    genb = jax.jit(lambda key: jax.random.normal(
        key, (nb, 2, N_SAMPLES), dtype=jnp.float32) * 0.25)
    syncb = jax.jit(lambda a: jnp.abs(a[..., -4:]).sum())
    xb = genb(jax.random.PRNGKey(100))
    _ = float(syncb(xb))
    y = br.render_files(xb)
    _ = float(syncb(y))               # warm compile + D2H
    log(f"ddt batched: compiled+warm in {time.time() - t0:.1f}s")
    best = 0.0
    for i in range(3):
        xb = genb(jax.random.PRNGKey(101 + i))
        _ = float(syncb(xb))
        t1 = time.perf_counter()
        y = br.render_files(xb)
        _ = float(syncb(y))
        dt = time.perf_counter() - t1
        best = max(best, nb * SECONDS / dt)
        log(f"ddt batched run {i + 1}: {dt * 1000:.1f} ms -> "
            f"{nb * SECONDS / dt:.0f} audio-s/s")
    ARTIFACT["ddt_batched"] = {
        "files": nb, "audio_s_per_s": round(best, 1),
        "per_file_rtx": round(best / nb, 1)}


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

    # FRESH on-device input per timed run.  Two honesty rules learned the
    # hard way on the axon tunnel (round-3 post-mortem):
    #  * re-dispatching identical (executable, buffers) pairs returns in
    #    ~0.3 ms without running anything — every timed run must use a
    #    fresh input;
    #  * block_until_ready does not reliably sync over the tunnel — the
    #    only trustworthy completion signal is fetching a value computed
    #    FROM the result, so each run times render + a 4-sample on-device
    #    reduction fetch (scalar D2H, negligible after warmup).
    # Inputs are generated ON device (seeded jax PRNG): H2D runs ~75 MB/s
    # at bad placements and a 23 MB upload would dominate the render.
    gen_fn = jax.jit(lambda key: jax.random.normal(
        key, (2, N_SAMPLES), dtype=jnp.float32) * 0.25)

    # stats computed on device; only 3 scalars cross the link
    stats_fn = jax.jit(lambda a: (jnp.max(jnp.abs(a)),
                                  jnp.sum(jnp.isfinite(a)),
                                  jnp.sum(jnp.abs(a))))
    sync_fn = jax.jit(lambda a: jnp.abs(a[:, -4:]).sum())

    x = gen_fn(jax.random.PRNGKey(0))
    _ = float(sync_fn(x))
    try:
        ARTIFACT["dispatch_ms"] = measure_dispatch_ms()
        log(f"dispatch round-trip: {ARTIFACT['dispatch_ms']} ms (median)")
    except Exception as exc:  # noqa: BLE001
        log(f"dispatch probe failed: {exc}")
    # fused single-dispatch render: the jitted program returns the output
    # -tail reduction itself, and fresh renders feed the device-resident
    # master carry (no clone dispatch) — per-run tunnel cost is ONE
    # dispatch + ONE scalar fetch
    y, carry, s = kern.render_device_sync(x)
    _ = float(s)                   # warms render + the D2H scalar path
    log("render pipeline compiled + first run done")

    # INVARIANT: run #1 always happens — a slow compile must never zero
    # the artifact again (round-2 post-mortem).  The deadline anchors to
    # NOW, not T0: startup device-recovery probes must not eat the
    # timing window (runs cost <1 s each once compiled).
    deadline = max(T0 + 420.0, time.time() + 45.0)
    best = 0.0
    runs = 0
    while runs < 1 or (runs < 5 and time.time() < deadline):
        x = gen_fn(jax.random.PRNGKey(runs + 1))
        _ = float(sync_fn(x))      # input fully materialized before t0
        t0 = time.perf_counter()
        y, carry, s = kern.render_device_sync(x)
        _ = float(s)               # fetch-forced completion
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

    # batched throughput: N independent 60 s renders in ONE dispatch
    # (vmap over the files axis).  The single-render RT× tracks tunnel
    # placement (round 4: 60 s of audio in ~43 ms wall of which ~26 ms
    # was ONE dispatch round-trip), so the artifact carries BOTH figures
    # — batched audio-seconds/sec/chip is the placement-robust one.
    try:
        _ddt_batched(program, gen_fn)
    except Exception as exc:  # noqa: BLE001
        ARTIFACT["ddt_batched"] = {"error": str(exc)[:200]}
        log(f"ddt batched failed: {exc}")
    emit()

    # remaining BASELINE configs, bounded so the artifact lands on time.
    # ZORAK_BENCH_DEADLINE_S widens the window for cache-banking warmup
    # runs (a cold container pays ~1 h of remote catalog compiles; they
    # persist in the compile cache for the driver's official run).
    # Default sized so ALL FOUR suite sections fit after DDT even with
    # some cold compiles: no artifact ever held all five north-star
    # configs because the round-4 default (1500 s) ran dry after the
    # catalog section (round-4 verdict #3/weak #1).
    deadline_s = float(os.environ.get("ZORAK_BENCH_DEADLINE_S", "3300"))
    run_suite_configs(budget_s=max(0.0, (T0 + deadline_s) - time.time()))

    _fill_stale(ARTIFACT["suite"])
    emit()
    sys.stdout.flush()
    sys.stderr.flush()
    # a stuck D2H fetch thread must not abort interpreter teardown
    os._exit(0)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        sys.exit(_section_child(sys.argv[2], float(sys.argv[3])
                                if len(sys.argv) > 3 else 600.0))
    sys.exit(main())
