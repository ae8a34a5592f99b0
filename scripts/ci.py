"""One-command CI gate (VERDICT r2 #8; fills the reference's
.github/workflows/release.yml role for this offline container).

Tiers:
  python scripts/ci.py            # fast: full pytest suite + multichip dryrun
  python scripts/ci.py --slow     # + RUN_SLOW tier (devexec catalog plugins,
                                  #   heavy perturbed slider configs) — the
                                  #   "weekly" tier; hours on a 1-core box
  python scripts/ci.py --tpu      # + official bench.py on the real chip
                                  #   (requires the axon tunnel; artifact
                                  #   JSON printed at the end)

Exit code 0 = gate passed.  Stages run serialized (this container has one
CPU core); each stage streams its output and a failed stage stops the run.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str], env: dict | None = None) -> None:
    print(f"\n=== ci: {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    e = dict(os.environ)
    # keep the axon sitecustomize dir FIRST — clobbering PYTHONPATH makes
    # TPU registration silently fall back to CPU (CLAUDE.md)
    parts = [p for p in e.get("PYTHONPATH", "").split(":") if p]
    if REPO not in parts:
        parts.append(REPO)
    e["PYTHONPATH"] = ":".join(parts)
    if env:
        e.update(env)
    r = subprocess.run(cmd, cwd=REPO, env=e)
    dt = time.time() - t0
    if r.returncode != 0:
        print(f"=== ci: {name} FAILED (exit {r.returncode}, {dt:.0f}s)",
              flush=True)
        sys.exit(r.returncode)
    print(f"=== ci: {name} ok ({dt:.0f}s)", flush=True)


def main() -> None:
    slow = "--slow" in sys.argv
    tpu = "--tpu" in sys.argv
    py = sys.executable

    # 1. unit + integration suite: frontend negatives, golden-executor
    #    parity, specializer nulls, devexec synthetics, engine, comm, gfx
    run("pytest", [py, "-m", "pytest", "tests/", "-q"])

    # 2. multi-chip sharding dryrun on a virtual 8-device CPU mesh
    run("multichip-dryrun", [py, "__graft_entry__.py"],
        env={"XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()})

    if slow:
        # 3. weekly tier: devexec catalog fallbacks + HEAVY perturbed
        #    slider configs in the deep null sweep
        run("pytest-slow",
            [py, "-m", "pytest", "tests/test_catalog_nulls.py",
             "tests/test_long_null.py", "-q"],
            env={"RUN_SLOW": "1"})

    if tpu:
        # 4. the real-hardware verdict: official bench artifact
        run("bench", [py, "bench.py"])

    print("\n=== ci: gate PASSED", flush=True)


if __name__ == "__main__":
    main()
