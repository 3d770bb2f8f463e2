"""Every shipped experiment config must parse and build a working model."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from accel_tpu.config import load_config
from accel_tpu.models.accel import build_model

CFGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                     "experiments", "cfgs", "*.yaml")))


@pytest.mark.parametrize("cfg_path", CFGS, ids=[os.path.basename(c) for c in CFGS])
def test_cfg_builds_model(cfg_path):
    cfg = load_config(cfg_path)
    model = build_model(cfg)
    assert model.family in ("deeplab", "dff", "accel")
    # shape-level init (abstract: no FLOPs) proves the architecture wires up
    size = 256 if int(cfg.network.get("flow_input_downscale", 2)) >= 4 else 128
    img = jnp.zeros((1, size, size, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, img, jnp.ones((1,)),
                           train=False)
    )
    n_params = sum(
        int(jnp.prod(jnp.asarray(x.shape))) for x in jax.tree.leaves(variables["params"])
    )
    assert n_params > 1e6
