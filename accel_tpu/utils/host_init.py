"""Host-side parameter initialization.

Flax ``init`` executes eagerly op-by-op; on a remote/tunneled TPU backend
every one of those tiny dispatches pays a round trip (measured: ~6 minutes
to init a 110M-param AccelNet). Initializing on the in-process CPU backend
and shipping one 440MB tree to the device takes seconds.
"""

from __future__ import annotations

import jax


def host_init(model, *init_args, seed: int = 0, **init_kwargs):
    """model.init on the CPU backend, then device_put to the default device.

    Persisting these CPU-backend compiles is blocked for the init: XLA:CPU
    AOT results record tuning pseudo-features (+prefer-no-gather/-scatter)
    that never match the raw host feature list, so *reloading* any cached
    CPU executable spews machine-feature/SIGILL warnings even on the
    compiling host. Init programs are one-shot per process anyway. The
    block raises ``jax_persistent_cache_min_compile_time_secs`` (read
    dynamically at cache-put time) rather than unsetting the cache dir —
    the cache object is a module singleton initialized at most once, so
    flipping the dir config after first use is silently ignored."""
    try:
        prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    except AttributeError:
        prev_min = None
    if prev_min is not None:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(seed), *init_args, **init_kwargs
            )
    finally:
        if prev_min is not None:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", prev_min
            )
    if jax.default_backend() != "cpu":
        variables = jax.device_put(variables, jax.devices()[0])
    return variables
