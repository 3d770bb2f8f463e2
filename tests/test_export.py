"""Serving-export round trip (core/export.py): the fused clip-inference
program serialized via jax.export, reloaded without touching the flax
model, and checked for exact prediction parity. The reference has no
deployment artifact at all (SURVEY.md §4 — eval scripts are the only
serving surface); this is the TPU-native production packaging."""

import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.core.export import export_serving, load_serving, make_serving_fn


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 2, 128, 128, 3)), jnp.float32) * 0.1


def test_export_embed_params_symbolic_batch(tiny_accel, frames, tmp_path):
    m, variables = tiny_accel
    k = 2
    path = str(tmp_path / "accel.shlo")
    blob = export_serving(
        m, variables, (128, 128), k, propagate="direct", batch="b", path=path
    )
    assert blob[:8] == b"ACCELTPU"

    serve = load_serving(path)
    want = make_serving_fn(m, k, "direct")(variables, frames)
    got = serve(frames)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # batch-polymorphic: same artifact, different batch
    got1 = serve(frames[:1])
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want[:1]))


def test_export_params_as_argument(tiny_accel, frames):
    m, variables = tiny_accel
    k = 2
    blob = export_serving(
        m, variables, (128, 128), k, batch=2, embed_params=False
    )
    serve = load_serving(blob)
    want = make_serving_fn(m, k, "direct")(variables, frames)
    got = serve(variables, frames)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_load_rejects_garbage(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="magic"):
        load_serving(str(p))
