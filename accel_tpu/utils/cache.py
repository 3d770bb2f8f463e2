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
    ``JAX_CACHE_DIR`` overrides entirely (caller opts out of keying)."""
    import jax

    path = os.environ.get("JAX_CACHE_DIR")
    if not path:
        base = base or "/tmp/jax_cache"
        # v2: abandons dirs that may hold CPU AOT entries written before
        # host_init started bypassing the cache (their reload always warns)
        path = f"{base}_v2_{platform.machine()}_{_host_fingerprint()}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    return path
