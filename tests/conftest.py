"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4 —
multi-chip sharding tests without a pod)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    # XLA:CPU in-process collectives SIGABRT the process if a participant is
    # >40s late to a rendezvous; on 1-CPU hosts the 8 device programs
    # time-share one core and can exceed that (observed in dryrun_multichip)
    + " --xla_cpu_collective_timeout_seconds=1200"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_accel():
    """Small AccelNet + variables shared across tests (init is the slow part)."""
    from accel_tpu.models.accel import AccelNet

    m = AccelNet(
        family="accel", ref_depth=18, update_depth=18, num_classes=19,
        feat_stride=16, head_channels=32, dtype=jnp.float32, use_pallas_warp=False,
    )
    cur = jnp.zeros((1, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), cur, cur, jnp.ones((1,)), train=False)
    return m, variables
