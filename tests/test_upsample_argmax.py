"""Fused upsample+argmax kernel vs the resize-then-argmax oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.ops.upsample import resize_bilinear
from accel_tpu.ops.upsample_argmax import resize_matrix, upsample_argmax


def _oracle(logits, out_hw):
    return jnp.argmax(resize_bilinear(logits, out_hw), axis=-1).astype(jnp.uint8)


def test_resize_matrix_matches_resize():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 16)), jnp.float32)
    a = resize_matrix(8, 64)
    b = resize_matrix(16, 256)
    via_mat = a @ x @ b.T
    via_resize = jax.image.resize(x, (64, 256), method="linear")
    np.testing.assert_allclose(np.asarray(via_mat), np.asarray(via_resize), atol=1e-5)


@pytest.mark.parametrize("shape,out_hw,rb", [
    ((2, 8, 16, 19), (128, 256), 64),   # integer x16 (the serving shape)
    ((1, 12, 20, 11), (128, 256), 128),  # non-integer ratio, CamVid classes
])
def test_fused_matches_oracle(shape, out_hw, rb):
    logits = jnp.asarray(
        np.random.default_rng(1).standard_normal(shape), jnp.float32
    )
    got = np.asarray(upsample_argmax(logits, out_hw, row_block=rb, interpret=True))
    want = np.asarray(_oracle(logits, out_hw))
    # f32 everywhere: only sum-order ULP ties can differ
    mismatch = (got != want).mean()
    assert mismatch < 1e-3, f"mismatch fraction {mismatch}"


def test_fused_rejects_unaligned_rows():
    logits = jnp.zeros((1, 8, 16, 19), jnp.float32)
    with pytest.raises(ValueError):
        upsample_argmax(logits, (100, 256), row_block=64, interpret=True)


def test_first_max_tie_break():
    # two channels exactly equal at every pixel: argmax must pick the first
    plane = jnp.ones((1, 8, 16, 1), jnp.float32)
    logits = jnp.concatenate([plane * 0.5, plane, plane, plane * 0.2], axis=-1)
    got = np.asarray(upsample_argmax(logits, (64, 128), row_block=64, interpret=True))
    assert (got == 1).all()
