"""Prune-op unit tests vs NumPy oracles (test strategy: SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.ops.prune import (
    prune_24,
    prune_block_magnitude,
    prune_block_topk,
    prune_check_24,
    prune_check_nm,
    prune_nm,
    prune_threshold,
)


def test_block_prune_default_2x2_half(rng):
    w = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    pruned, mask = prune_block_magnitude(w, block=(2, 2), sparsity=0.5)
    p = np.asarray(pruned)
    mk = np.asarray(mask)
    # Exactly 2 of every 2x2 block survive.
    for i in range(0, 16, 2):
        for j in range(0, 32, 2):
            blk = mk[i : i + 2, j : j + 2]
            assert blk.sum() == 2
    # Survivors are the two largest magnitudes of each block.
    wn = np.asarray(w)
    for i in range(0, 16, 2):
        for j in range(0, 32, 2):
            blk = np.abs(wn[i : i + 2, j : j + 2]).ravel()
            kept = np.abs(p[i : i + 2, j : j + 2]).ravel()
            top2 = np.sort(blk)[2:]
            assert set(np.round(kept[kept != 0], 6)) <= set(np.round(blk, 6))
            assert np.isclose(sorted(kept[kept != 0]), np.sort(top2)).all()


def test_block_prune_sparsity_factor(rng):
    w = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
    # 75% of each 4x4 block dropped -> 4 survivors per block.
    _, mask = prune_block_magnitude(w, block=(4, 4), sparsity=0.75)
    m = np.asarray(mask).reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
    assert (m.reshape(4, 16).sum(-1) == 4).all()


def test_block_prune_batched(rng):
    w = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
    pruned, mask = prune_block_magnitude(w)
    for i in range(3):
        p1, m1 = prune_block_magnitude(w[i])
        np.testing.assert_array_equal(np.asarray(pruned[i]), np.asarray(p1))


def test_block_prune_rejects_indivisible():
    with pytest.raises(ValueError):
        prune_block_magnitude(jnp.zeros((7, 8)))


def test_prune_24_structure(rng):
    w = jnp.asarray(rng.normal(size=(32, 128)), jnp.bfloat16)
    pruned, mask = prune_24(w)
    assert bool(prune_check_24(pruned))
    g = np.asarray(mask, np.float32).reshape(32, 32, 4)
    assert (g.sum(-1) == 2).all()


def test_prune_24_keeps_top2_magnitude():
    w = jnp.asarray([[1.0, -5.0, 2.0, 0.5, 9.0, -1.0, 3.0, 4.0]])
    pruned, _ = prune_24(w)
    np.testing.assert_allclose(
        np.asarray(pruned), [[0.0, -5.0, 2.0, 0.0, 9.0, 0.0, 0.0, 4.0]]
    )


def test_prune_nm_unpadded_tail(rng):
    # k not divisible by m: tail group is padded, real values unaffected.
    w = jnp.asarray(rng.normal(size=(4, 10)), jnp.float32)
    pruned, mask = prune_nm(w, 2, 4)
    assert pruned.shape == (4, 10)
    # First two full groups obey 2:4.
    g = np.asarray(mask)[:, :8].reshape(4, 2, 4)
    assert (g.sum(-1) == 2).all()


def test_prune_check_rejects_dense(rng):
    w = jnp.asarray(rng.normal(size=(8, 16)) + 10.0, jnp.float32)
    assert not bool(prune_check_24(w))
    assert bool(prune_check_nm(jnp.zeros((8, 16)), 2, 4))


def test_prune_threshold(rng):
    w = jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)
    pruned, mask = prune_threshold(w, 1.0)
    p = np.asarray(pruned)
    assert ((np.abs(p) >= 1.0) | (p == 0)).all()
    np.testing.assert_array_equal(
        np.asarray(mask) != 0, np.abs(np.asarray(w)) >= 1.0
    )


def test_prune_block_topk_structure(rng):
    w = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    pruned, cols = prune_block_topk(w, block_size=8, ell_blocks=4)
    assert cols.shape == (4, 4)
    c = np.asarray(cols)
    # Sorted ascending, unique per block-row (spmm.cu:63-84 contract).
    assert (np.diff(c, axis=-1) > 0).all()
    # Kept blocks are exactly the top-ell by norm.
    p = np.asarray(pruned).reshape(4, 8, 8, 8)
    wn = np.asarray(w).reshape(4, 8, 8, 8)
    norms = (wn**2).sum((1, 3))
    for r in range(4):
        top = set(np.argsort(norms[r])[-4:])
        assert set(c[r]) == top
        for cb in range(8):
            blk = p[r, :, cb, :]
            if cb in top:
                np.testing.assert_array_equal(blk, wn[r, :, cb, :])
            else:
                assert (blk == 0).all()


def test_prune_block_topk_batched(rng):
    w = jnp.asarray(rng.normal(size=(2, 16, 32)), jnp.float32)
    pruned, cols = prune_block_topk(w, block_size=8, ell_blocks=2)
    assert pruned.shape == (2, 16, 32)
    assert cols.shape == (2, 2, 2)
    for i in range(2):
        p1, c1 = prune_block_topk(w[i], block_size=8, ell_blocks=2)
        np.testing.assert_array_equal(np.asarray(cols[i]), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(pruned[i]), np.asarray(p1))
