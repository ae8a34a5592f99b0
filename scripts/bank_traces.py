"""Copy devgen trace-cache artifacts into the repo-committed bank.

The live cache (~/.cache/zorak_tpu/devgen_traces) is wiped whenever the
container migrates; artifacts banked under artifacts/devgen_traces ride
git and serve as a read-only fallback (lowering/tracecache.py bank_dir),
so a fresh checkout skips the multi-minute cold devgen traces of the big
plugins (Sample ~27 min, Texture ~6 min).

Usage: python scripts/bank_traces.py [--min-bytes N] [--plugin SUBSTR]
Only artifacts whose sidecar metadata matches --plugin (default: all)
and whose blob is at least --min-bytes (default 4096 — tiny traces
retrace in milliseconds, not worth repo weight) are copied.  Stale
entries already in the bank whose key no longer resolves are left alone:
the key hashes the lowering sources, so they can never be served wrongly.
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zorak_tpu.lowering.tracecache import bank_dir, cache_dir  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-bytes", type=int, default=4096)
    ap.add_argument("--plugin", default="")
    args = ap.parse_args()

    src, dst = cache_dir(), bank_dir()
    os.makedirs(dst, exist_ok=True)
    n = total = 0
    for name in sorted(os.listdir(src)):
        if not name.endswith(".jexp"):
            continue
        blob = os.path.join(src, name)
        size = os.path.getsize(blob)
        if size < args.min_bytes:
            continue
        meta_name = name[: -len(".jexp")] + ".json"
        meta_path = os.path.join(src, meta_name)
        plugin = ""
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as f:
                    plugin = json.load(f).get("plugin", "")
            except (OSError, ValueError):
                pass
        if args.plugin and args.plugin.lower() not in plugin.lower():
            continue
        shutil.copy2(blob, os.path.join(dst, name))
        if os.path.exists(meta_path):
            shutil.copy2(meta_path, os.path.join(dst, meta_name))
        n += 1
        total += size
        print(f"banked {name} ({size} bytes) [{plugin!r}]")
    print(f"{n} artifacts, {total / 1e6:.1f} MB -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
