"""Fused Pallas stem (ops/fused_stem.py) vs the conv7 oracle path.

Interpret mode exercises the kernel on CPU (warp-kernel test pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accel_tpu.ops.fused_stem import (
    _oracle,
    fused_stem,
    fused_stem_fwd,
    pack_stem_kernel,
)


def _inputs(seed=0, shape=(2, 32, 64, 3)):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    inv = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    return x, k, inv, shift


def test_exact_vs_oracle_f32():
    x, k, inv, shift = _inputs(0)
    out = fused_stem_fwd(x, k, inv, shift, row_block=4, interpret=True)
    ref = _oracle(x, k, inv, shift)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-5)


def test_row_block_remainder():
    # H/2 = 15 not divisible by row_block 4: the rounded grid's garbage
    # rows must slice off
    x, k, inv, shift = _inputs(1, shape=(1, 30, 32, 3))
    out = fused_stem_fwd(x, k, inv, shift, row_block=4, interpret=True)
    ref = _oracle(x, k, inv, shift)
    assert out.shape == (1, 15, 16, 64)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-5)


def test_grad_rides_oracle():
    x, k, inv, shift = _inputs(2, shape=(1, 16, 16, 3))

    def f_kernel(xx, kk):
        return jnp.sum(fused_stem(xx, kk, inv, shift).astype(jnp.float32) ** 2)

    def f_oracle(xx, kk):
        return jnp.sum(_oracle(xx, kk, inv, shift).astype(jnp.float32) ** 2)

    gk = jax.grad(f_kernel, argnums=(0, 1))(x, k)
    go = jax.grad(f_oracle, argnums=(0, 1))(x, k)
    for a, b in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_pack_covers_all_taps():
    # every (ky,kx,c) tap lands on a distinct matmul row; 21 rows dead
    k = jnp.arange(7 * 7 * 3, dtype=jnp.float32).reshape(7, 7, 3, 1)
    k = jnp.broadcast_to(k, (7, 7, 3, 64))
    packed = pack_stem_kernel(k)  # (64, 168)
    nz = int(jnp.count_nonzero(packed[0]))
    assert nz == 7 * 7 * 3 - 1  # tap value 0 is the single zero entry


def test_resnet_fused7_matches_conv7():
    """Model-level: stem='fused7' reproduces the conv7+frozenbn+relu+pool
    stem bit-for-bit-tree-compatibly (same variables restore into both)."""
    from accel_tpu.models.resnet import DilatedResNet

    m0 = DilatedResNet(depth=18, output_stride=16, norm="frozenbn",
                       stem="conv7", dtype=jnp.float32)
    m1 = DilatedResNet(depth=18, output_stride=16, norm="frozenbn",
                       stem="fused7", dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 64, 64, 3)) * 0.5,
        jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x, train=False)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=False)
    # identical variable trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v1)
    out0 = m0.apply(v, x, train=False)
    out1 = m1.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               atol=1e-4, rtol=1e-4)


def test_fused7_requires_frozenbn():
    from accel_tpu.models.resnet import DilatedResNet

    m = DilatedResNet(depth=18, norm="groupnorm", stem="fused7",
                      dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError, match="frozenbn"):
        m.init(jax.random.PRNGKey(0), x, train=False)
