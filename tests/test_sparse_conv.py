"""SparseConv2d: im2col + 2:4 SpMM must equal the dense conv on the
pruned weight (the spmm(prune(A), B) == dense(prune(A)) @ B identity of
SURVEY.md section 4, lifted to the conv level)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparsifyme_tpu.models.sparse_conv import (
    SparseConv2d,
    conv_weight_as_matrix,
    im2col,
)


@pytest.mark.parametrize("stride,padding", [(1, "SAME"), (2, "SAME"),
                                            (1, "VALID")])
def test_sparse_conv_matches_dense_conv(rng, stride, padding):
    oc, ic, kh, kw = 16, 8, 3, 3
    w = jnp.asarray(rng.normal(size=(oc, ic, kh, kw)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, ic)), jnp.float32)
    layer = SparseConv2d(w, stride=stride, padding=padding)
    got = layer(x)
    want = layer.dense_reference(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_im2col_shape_matches_dataset_math(rng):
    # The dataset generator's m = oh*ow, k = in_ch*kh*kw accounting
    # (datasets/get_shapes.py:68-74) must match the real unfold.
    x = jnp.asarray(rng.normal(size=(3, 14, 14, 64)), jnp.float32)
    p = im2col(x, 3, 3, stride=1, padding="SAME")
    assert p.shape == (3, 14, 14, 64 * 9)


def test_weight_matrix_shape():
    w = jnp.zeros((64, 3, 7, 7))
    assert conv_weight_as_matrix(w).shape == (64, 147)


def test_ell_conv2d_matches_dense_reference(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparsifyme_tpu.models.sparse_conv import EllConv2d

    w = jnp.asarray(rng.normal(size=(16, 3, 3, 3)), jnp.float32)
    conv = EllConv2d(w, block_size=8, block_k=8)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    got = conv(x)
    want = conv.dense_reference(x)
    assert got.shape == want.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ell_conv2d_trains(rng):
    """jax.grad through the ELL conv (round-5 VJP) reduces a loss."""
    import jax
    import jax.numpy as jnp

    from sparsifyme_tpu.containers import BlockedEll
    from sparsifyme_tpu.models.sparse_conv import EllConv2d

    w = jnp.asarray(rng.normal(size=(16, 3, 3, 3)), jnp.float32)
    conv = EllConv2d(w, block_size=8, block_k=8)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    e = conv.weight

    def loss(values):
        conv.weight = BlockedEll(values=values,
                                 col_indices=e.col_indices,
                                 shape=e.shape,
                                 block_size=e.block_size,
                                 block_k=e.block_k)
        return jnp.mean((conv(x) - y) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    v = e.values
    l0, _ = step(v)
    for _ in range(5):
        _, g = step(v)
        v = v - 0.1 * g
    l1, _ = step(v)
    assert float(l1) < float(l0)
