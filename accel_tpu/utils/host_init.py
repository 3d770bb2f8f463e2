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

    The persistent compile cache is suspended for the init: XLA:CPU AOT
    results record tuning pseudo-features (+prefer-no-gather/-scatter) that
    never match the raw host feature list, so *reloading* any cached CPU
    executable spews machine-feature/SIGILL warnings even on the compiling
    host. Init programs are one-shot per process anyway — caching them buys
    nothing and poisons every later run's logs."""
    cache_dir = None
    try:
        cache_dir = jax.config.jax_compilation_cache_dir
    except AttributeError:
        pass
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", None)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(seed), *init_args, **init_kwargs
            )
    finally:
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    if jax.default_backend() != "cpu":
        variables = jax.device_put(variables, jax.devices()[0])
    return variables
