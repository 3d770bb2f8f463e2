"""Host-side parameter initialization.

Flax ``init`` executes eagerly op-by-op; on a remote/tunneled TPU backend
every one of those tiny dispatches pays a round trip (measured: ~6 minutes
to init a 110M-param AccelNet). Initializing on the in-process CPU backend
and shipping one 440MB tree to the device takes seconds.
"""

from __future__ import annotations

import jax


def host_init(model, *init_args, seed: int = 0, **init_kwargs):
    """model.init on the CPU backend, then device_put to the default device."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(seed), *init_args, **init_kwargs)
    if jax.default_backend() != "cpu":
        variables = jax.device_put(variables, jax.devices()[0])
    return variables
