"""Persistent XLA compile cache, keyed by host fingerprint.

XLA:CPU caches AOT-compiled executables that embed the compiling machine's
CPU features; reusing them on a different host triggers pages of
machine-feature-mismatch / potential-SIGILL warnings (and actual SIGILL in
the worst case). The drivers run bench/tests on varying hosts against the
same /tmp, so the cache directory is suffixed with a CPU-feature hash —
each host class gets its own cache.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feat = line.strip()
                    break
    except OSError:
        feat = platform.processor() or platform.machine()
    return hashlib.sha1(feat.encode()).hexdigest()[:10]


def setup_compile_cache(base: str | None = None) -> str:
    """Point jax's persistent compile cache at a host-keyed directory.
    ``JAX_CACHE_DIR`` overrides entirely (caller opts out of keying).

    TPU backends only: XLA:CPU AOT executables embed tuning pseudo-features
    (+prefer-no-gather/-scatter) that never appear in the raw host feature
    list, so *reloading* a cached CPU executable warns about machine-feature
    mismatch / SIGILL even on the host that compiled it. CPU runs (tests,
    ACCEL_PLATFORM=cpu) therefore get no persistent cache at all — and TPU
    processes must avoid persisting their own CPU-backend compiles (see
    ``utils/host_init``)."""
    import jax

    if jax.default_backend() != "tpu":
        return ""
    path = os.environ.get("JAX_CACHE_DIR")
    if not path:
        base = base or "/tmp/jax_cache"
        # v3: abandons dirs holding CPU AOT entries written before the
        # tpu-only gate (their reload always warns, even same-host)
        path = f"{base}_v3_{platform.machine()}_{_host_fingerprint()}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    return path
