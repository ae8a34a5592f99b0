"""Persistent XLA compile cache, keyed by a host fingerprint.

Coupled-pipeline plugins have multi-minute first compiles; the cache
makes every later process (tests, bench, suite, CLI) reuse them.  The
fingerprint matters: XLA:CPU AOT entries compiled for another machine's
feature set SIGILL when loaded (containers migrate hosts between
rounds)."""
import hashlib
import os
import platform


def host_fingerprint() -> str:
    # model name/family/stepping matter, not just the flags line: two
    # hosts with identical cpuinfo flags can still get different LLVM
    # tuning (prefer-no-scatter/gather), and loading the other host's
    # XLA:CPU AOT entries then corrupts the process (observed: stale
    # entries from a migrated container SIGILL/segfault mid-run).
    keys = ("flags", "Features", "model name", "cpu family", "model",
            "stepping", "vendor_id")
    feat = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in keys:
                    feat.append(line.strip())
                if line.strip() == "" and feat:
                    break  # first core only
    except OSError:
        pass
    raw = f"{platform.machine()}|{'|'.join(feat)}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def raise_map_count(target: int = 1 << 20) -> None:
    """XLA:CPU's ORC JIT maps thousands of sections per big executable;
    a full catalog sweep in one process exhausts the default
    vm.max_map_count=65530 (symptom: 'LLVM compilation error: Cannot
    allocate memory' + munmap ENOMEM, then a segfault).  Raise it when
    we can (root in this container); harmless no-op otherwise."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            cur = int(f.read().strip())
        if cur < target:
            with open("/proc/sys/vm/max_map_count", "w") as f:
                f.write(str(target))
    except OSError:
        pass


def enable_persistent_cache(min_compile_secs: float = 10.0) -> str:
    import jax

    raise_map_count()
    # TPU executables are serialized device programs — valid regardless of
    # which host the container lands on, so key them by backend name only.
    # XLA:CPU AOT output is host-feature-specific (see host_fingerprint).
    backend = jax.default_backend()
    key = host_fingerprint() if backend == "cpu" else backend
    path = os.path.expanduser(f"~/.cache/zorak_tpu/jaxcache-{key}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
