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
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat = line
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feat}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def enable_persistent_cache(min_compile_secs: float = 10.0) -> str:
    import jax

    path = os.path.expanduser(
        f"~/.cache/zorak_tpu/jaxcache-{host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
