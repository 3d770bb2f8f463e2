import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from accel_tpu.utils.host_init import host_init
from accel_tpu.utils.logger import create_logger
from accel_tpu.utils.metrics_writer import MetricsWriter
from accel_tpu.utils.profiler import StageTimer, debug_nans


def test_metrics_writer(tmp_path):
    p = tmp_path / "m.jsonl"
    w = MetricsWriter(str(p))
    w.write(1, loss=2.5, note="warmup")
    w.write(2, loss=jnp.float32(1.25))
    w.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["step"] == 1 and recs[0]["loss"] == 2.5
    assert recs[1]["loss"] == 1.25


def test_create_logger(tmp_path):
    logger, out = create_logger(str(tmp_path), "expA", "train")
    logger.info("hello")
    for h in logger.handlers:
        h.flush()
    logs = [f for f in os.listdir(out) if f.endswith(".log")]
    assert logs and "expA" in logs[0]
    assert any("hello" in l for l in open(os.path.join(out, logs[0])))
    logging.getLogger("accel_tpu.expA").handlers.clear()


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        x = jnp.ones((4,)) + 1
    with t.stage("a", sync=x):
        _ = x * 2
    assert t.counts["a"] == 2
    assert "a=" in t.summary()


def test_debug_nans_context():
    before = jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_host_init_places_on_default_device():
    from accel_tpu.models.resnet import DilatedResNet

    m = DilatedResNet(depth=18, dtype=jnp.float32)
    v = host_init(m, jnp.zeros((1, 32, 32, 3)))
    leaf = jax.tree.leaves(v["params"])[0]
    assert leaf.device in jax.devices() or leaf.device.platform == "cpu"
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n > 1e6


def test_effective_platform_respects_default_device():
    from accel_tpu.ops.warp_pallas import _effective_platform

    assert _effective_platform() == "cpu"
    with jax.default_device(jax.devices("cpu")[0]):
        assert _effective_platform() == "cpu"
