"""Blocked-ELL format + SpMM tests vs dense oracles (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.containers import BlockedEll
from sparsifyme_tpu.ops.ell import (
    ell_from_dense,
    ell_pack,
    ell_to_dense,
    spmm_ell,
    spmm_ell_reference,
)
from sparsifyme_tpu.ops.prune import prune_block_topk


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


def test_pack_unpack_roundtrip(rng):
    w = _rand(rng, (32, 64))
    pruned, cols = prune_block_topk(w, block_size=8, ell_blocks=4)
    e = ell_from_dense(w, block_size=8, ell_blocks=4)
    back = ell_to_dense(e)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pruned))


def test_pack_batched(rng):
    w = _rand(rng, (3, 16, 32))
    e = ell_from_dense(w, block_size=8, ell_blocks=2)
    assert e.values.shape == (3, 16, 16)
    assert e.col_indices.shape == (3, 2, 2)
    back = ell_to_dense(e)
    for i in range(3):
        e1 = ell_from_dense(w[i], block_size=8, ell_blocks=2)
        np.testing.assert_array_equal(
            np.asarray(back[i]), np.asarray(ell_to_dense(e1))
        )


def test_half_density_matches_reference_contract(rng):
    # ell_cols = cols/2: the 50%-sparsity assumption of the reference
    # driver (examples/spmm.cu:47-48).
    w = _rand(rng, (64, 64))
    e = ell_from_dense(w, block_size=8, ell_blocks=4)
    assert e.nnz == 64 * 32  # half the dense elements stored


@pytest.mark.parametrize(
    "m,k,n,bs,ell",
    [
        (16, 32, 16, 8, 2),
        (32, 64, 48, 8, 4),
        (64, 128, 100, 16, 4),  # unaligned n
        (128, 256, 128, 128, 1),  # single MXU-size block
    ],
)
def test_spmm_ell_matches_oracle(rng, m, k, n, bs, ell):
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell)
    b = _rand(rng, (k, n))
    got = spmm_ell(e, b, out_dtype=jnp.float32)
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tr", [False, True])
@pytest.mark.parametrize("bkb", [16, 32])
def test_spmm_ell_gather_db(rng, tr, bkb):
    """Double-buffered async slab gather == plain gather (all
    formulations compute the identical contraction)."""
    m, k, n = 64, 128, 192
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=16, ell_blocks=2, block_k=bkb)
    b = _rand(rng, (k, n))
    got = spmm_ell(e, b, out_dtype=jnp.float32, gather_db=True,
                   transpose_out=tr)
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(b, np.float64)
    if tr:
        want = want.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_block_rows_cap(rng):
    """Capped block-row tile (smaller grid steps) == default result."""
    m, k, n = 128, 64, 96
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=8, ell_blocks=2)
    b = _rand(rng, (k, n))
    got = spmm_ell(e, b, out_dtype=jnp.float32, block_rows_cap=2)
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bn", [128, 256, 384])
def test_spmm_ell_explicit_block_n(rng, bn):
    """Tuned full-width B-slab override (block_n): same result as the
    default n-tiling, including when block_n exceeds n (the kernel pads
    B/C to a block_n multiple and slices the result back)."""
    m, k, n = 64, 128, 256
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=16, ell_blocks=4)
    b = _rand(rng, (k, n))
    got = spmm_ell(e, b, out_dtype=jnp.float32, block_n=bn)
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_batched_shared_b(rng):
    w = _rand(rng, (4, 16, 32))
    e = ell_from_dense(w, block_size=8, ell_blocks=2)
    b = _rand(rng, (32, 24))
    got = spmm_ell(e, b, out_dtype=jnp.float32)
    assert got.shape == (4, 16, 24)
    dense = ell_to_dense(e)
    for i in range(4):
        want = np.asarray(dense[i], np.float64) @ np.asarray(b, np.float64)
        np.testing.assert_allclose(
            np.asarray(got[i]), want, rtol=1e-4, atol=1e-4
        )


def test_spmm_ell_bf16(rng):
    w = _rand(rng, (32, 64), jnp.bfloat16)
    e = ell_from_dense(w, block_size=16, ell_blocks=2)
    b = _rand(rng, (64, 32), jnp.bfloat16)
    got = spmm_ell(e, b, out_dtype=jnp.float32)
    want = spmm_ell_reference(e, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize(
    "m,k,n,bs,bkb,ell,tr",
    [
        (256, 64, 48, 128, 32, 1, False),
        (256, 64, 48, 128, 32, 1, True),
        (384, 256, 130, 128, 32, 4, False),
        (256, 147, 64, 128, 32, 2, True),   # ragged k (padded)
    ],
)
def test_spmm_ell_expand_matches_oracle(rng, m, k, n, bs, bkb, ell, tr):
    """Expand-in-VMEM kernel == gather kernel == dense oracle."""
    from sparsifyme_tpu.ops.ell import ell_values_kmajor, spmm_ell_expand

    kp = -(-k // (2 * bkb)) * (2 * bkb)
    w = jnp.pad(_rand(rng, (m, k)), ((0, 0), (0, kp - k)))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell, block_k=bkb)
    b = _rand(rng, (kp, n))
    got = spmm_ell_expand(
        e, b, out_dtype=jnp.float32, transpose_out=tr,
        values_km=ell_values_kmajor(e),
    )
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(b, np.float64)
    if tr:
        want = want.T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_expand_batched(rng):
    from sparsifyme_tpu.ops.ell import spmm_ell_expand

    w = _rand(rng, (2, 128, 64))
    e = ell_from_dense(w, block_size=128, ell_blocks=1, block_k=32)
    b = _rand(rng, (64, 32))
    got = spmm_ell_expand(e, b, out_dtype=jnp.float32)
    assert got.shape == (2, 128, 32)
    dense = ell_to_dense(e)
    for i in range(2):
        want = np.asarray(dense[i], np.float64) @ np.asarray(b, np.float64)
        np.testing.assert_allclose(
            np.asarray(got[i]), want, rtol=1e-4, atol=1e-4
        )


def test_spmm_ell_alpha_beta_epilogue(rng):
    # alpha/beta epilogue parity vs the dense oracle (spmm.hxx:30-36).
    import numpy as np

    w = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    e = ell_from_dense(w, block_size=8, ell_blocks=4)
    got = spmm_ell(e, b, out_dtype=jnp.float32, alpha=3.0, beta=0.5, c=c)
    dense = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(
        b, np.float64)
    want = 3.0 * dense + 0.5 * np.asarray(c, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_transpose_b(rng):
    import numpy as np

    w = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    bt = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    e = ell_from_dense(w, block_size=8, ell_blocks=4)
    got = spmm_ell(e, bt, out_dtype=jnp.float32, transpose_b=True)
    want = np.asarray(ell_to_dense(e), np.float64) @ np.asarray(
        bt, np.float64).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("m,k,n,bs,bkb,ell", [
    (256, 256, 48, 128, 32, 2),
    (128, 512, 130, 128, 64, 4),  # unaligned n
])
def test_spmm_ell_gather_transpose_out(rng, m, k, n, bs, bkb, ell):
    """Gather kernel's C^T output layout (round-1 VERDICT test gap: only
    the expand kernel's transpose_out was covered)."""
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell, block_k=bkb)
    b = _rand(rng, (k, n))
    got = spmm_ell(e, b, out_dtype=jnp.float32, transpose_out=True)
    want = (np.asarray(ell_to_dense(e), np.float64)
            @ np.asarray(b, np.float64)).T
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_gather_transpose_out_batched(rng):
    """Batched C^T: batch folds into lanes of the [n, M] output."""
    w = _rand(rng, (2, 128, 256))
    e = ell_from_dense(w, block_size=128, ell_blocks=2, block_k=32)
    b = _rand(rng, (256, 32))
    got = spmm_ell(e, b, out_dtype=jnp.float32, transpose_out=True)
    dense = ell_to_dense(e)
    want = (np.asarray(dense, np.float64).reshape(-1, 256)
            @ np.asarray(b, np.float64)).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_ell_accum_dots_matches_oracle(rng):
    """Copy-free per-slab-dot gather formulation == concat formulation
    == oracle (both output layouts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparsifyme_tpu.ops.ell import (ell_from_dense, spmm_ell,
                                        spmm_ell_reference)

    for (b, m, k, n, bkb) in [(2, 196, 1024, 64, 64),
                              (1, 256, 2048, 512, 128)]:
        bs = 128
        kp = -(-k // (2 * bkb)) * (2 * bkb)
        mp = -(-m // bs) * bs
        a = jnp.asarray(rng.normal(size=(b, m, k)), jnp.bfloat16)
        ap = jnp.pad(a, ((0, 0), (0, mp - m), (0, kp - k)))
        bm = jnp.asarray(rng.normal(size=(kp, n)), jnp.bfloat16)
        e = ell_from_dense(ap, block_size=bs,
                           ell_blocks=max(1, (kp // bkb) // 2),
                           block_k=bkb)
        want = np.asarray(spmm_ell_reference(e, bm, out_dtype=jnp.float32))
        for tr in (False, True):
            got = np.asarray(spmm_ell(e, bm, out_dtype=jnp.float32,
                                      transpose_out=tr, accum_dots=True))
            if tr:
                got = got.swapaxes(-1, -2).reshape(want.shape)
            else:
                got = got.reshape(want.shape)
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_spmm_ell_n64_fullwidth_blocks(rng):
    """n < 128 layers take full-width (non-128) lane blocks — no C pad
    (round-3 fix: padding n=64 to 128 doubled the C write traffic).
    Both kernels, both output layouts, vs the dense oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparsifyme_tpu.ops.ell import (ell_from_dense, ell_values_kmajor,
                                        spmm_ell, spmm_ell_reference)
    from sparsifyme_tpu.ops.kernels.ell_kernel import ell_expand_spmm_pallas

    b_, m, k, n, bs, bkb = 2, 256, 128, 64, 128, 32
    a = jnp.asarray(rng.normal(size=(b_, m, k)), jnp.bfloat16)
    bm = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    e = ell_from_dense(a, block_size=bs, ell_blocks=2, block_k=bkb)
    want = np.asarray(spmm_ell_reference(e, bm, out_dtype=jnp.float32))
    for tr in (False, True):
        got = np.asarray(spmm_ell(e, bm, out_dtype=jnp.float32,
                                  transpose_out=tr))
        if tr:
            got = got.swapaxes(-1, -2)
        np.testing.assert_allclose(got.reshape(want.shape), want,
                                   rtol=2e-2, atol=2e-2)
    vkm = ell_values_kmajor(e)
    cols = e.col_indices.reshape(-1, e.col_indices.shape[-1])
    got = np.asarray(ell_expand_spmm_pallas(
        vkm, cols, bm, block_size=bs, block_k=bkb,
        out_dtype=jnp.float32))
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=2e-2, atol=2e-2)


def test_spmm_ell_conflicting_formulations_raise(rng):
    """gather_db and accum_dots are mutually exclusive (ADVICE r4: the
    db kernel silently dropped accum_dots)."""
    import pytest

    from sparsifyme_tpu.ops.ell import ell_from_dense, spmm_ell

    w = _rand(rng, (16, 32))
    e = ell_from_dense(w, block_size=8, ell_blocks=2)
    b = _rand(rng, (32, 8))
    with pytest.raises(ValueError, match="mutually exclusive"):
        spmm_ell(e, b, accum_dots=True, gather_db=True)


# ---------------------------------------------------------------------------
# Custom VJP (round 5): jax.grad through spmm_ell matches the dense-
# oracle gradient (VERDICT r4 item 6 — the winning sparse path must be
# trainable).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("tr", [False, True])
def test_spmm_ell_grad_matches_oracle(rng, tr):
    import jax

    from sparsifyme_tpu.ops.ell import ell_to_dense, spmm_ell

    m, k, n, bs, ell = 32, 64, 24, 8, 4
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell)
    b = _rand(rng, (k, n))
    t = _rand(rng, (n, m) if tr else (m, n))  # cotangent seed

    def loss_kernel(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        out = spmm_ell(e2, bm, out_dtype=jnp.float32, transpose_out=tr)
        return jnp.sum(out * t)

    def loss_oracle(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        a = ell_to_dense(e2)
        out = (a @ bm).astype(jnp.float32)
        if tr:
            out = out.T
        return jnp.sum(out * t)

    gv_k, gb_k = jax.grad(loss_kernel, argnums=(0, 1))(e.values, b)
    gv_o, gb_o = jax.grad(loss_oracle, argnums=(0, 1))(e.values, b)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_o),
                               rtol=1e-4, atol=1e-4)


def test_spmm_ell_grad_batched(rng):
    import jax

    from sparsifyme_tpu.ops.ell import ell_to_dense, spmm_ell

    bsz, m, k, n, bs, ell = 3, 16, 64, 8, 8, 4
    w = _rand(rng, (bsz, m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell)
    b = _rand(rng, (k, n))

    def loss_kernel(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        return jnp.sum(spmm_ell(e2, bm, out_dtype=jnp.float32) ** 2)

    def loss_oracle(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        out = jnp.einsum("bmk,kn->bmn", ell_to_dense(e2), bm)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gv_k, gb_k = jax.grad(loss_kernel, argnums=(0, 1))(e.values, b)
    gv_o, gb_o = jax.grad(loss_oracle, argnums=(0, 1))(e.values, b)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_o),
                               rtol=1e-4, atol=1e-4)


def test_ell_training_step_reduces_loss(rng):
    """A tiny ELL-linear regression trained through jax.grad + the
    Pallas kernel: loss must drop (the spmm_ell training story)."""
    import jax

    m, k, n, bs, ell = 16, 32, 8, 8, 2
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell)
    x = _rand(rng, (k, n))
    y = _rand(rng, (m, n))

    from sparsifyme_tpu.ops.ell import spmm_ell

    def loss(values):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        pred = spmm_ell(e2, x, out_dtype=jnp.float32)
        return jnp.mean((pred - y) ** 2)

    step = jax.jit(jax.value_and_grad(loss))
    v = e.values
    l0, g = step(v)
    for _ in range(5):
        l, g = step(v)
        v = v - 0.05 * g.astype(v.dtype)
    l1, _ = step(v)
    assert float(l1) < float(l0) * 0.9, (float(l0), float(l1))


def test_spmm_ell_expand_grad_matches_oracle(rng):
    """The expand formulation (small-k) is differentiable too."""
    import jax

    from sparsifyme_tpu.ops.ell import (ell_to_dense, ell_values_kmajor,
                                        spmm_ell_expand)

    m, k, n, bs, ell = 32, 64, 16, 8, 4
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell)
    b = _rand(rng, (k, n))
    t = _rand(rng, (m, n))

    def loss_kernel(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        out = spmm_ell_expand(e2, bm, out_dtype=jnp.float32)
        return jnp.sum(out * t)

    def loss_oracle(values, bm):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        return jnp.sum((ell_to_dense(e2) @ bm).astype(jnp.float32) * t)

    gv_k, gb_k = jax.grad(loss_kernel, argnums=(0, 1))(e.values, b)
    gv_o, gb_o = jax.grad(loss_oracle, argnums=(0, 1))(e.values, b)
    np.testing.assert_allclose(np.asarray(gv_k), np.asarray(gv_o),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_o),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tr", [False, True])
@pytest.mark.parametrize("acc", [False, True])
def test_spmm_ell_split_n(rng, tr, acc):
    """split_n sub-dots (round 5: bn=256-geometry dots under a single
    full-width n-tile) match the whole-dot path."""
    m, k, n, bs, ell = 32, 256, 256, 8, 2
    w = _rand(rng, (m, k))
    e = ell_from_dense(w, block_size=bs, ell_blocks=ell, block_k=128)
    b = _rand(rng, (k, n))
    want = spmm_ell_reference(e, b, out_dtype=jnp.float32)
    got = spmm_ell(e, b, out_dtype=jnp.float32, transpose_out=tr,
                   accum_dots=acc, split_n=2)
    if tr:
        got = got.T
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


def test_spmm_ell_split_n_db_rejected(rng):
    import pytest as _pytest

    w = _rand(rng, (16, 64))
    e = ell_from_dense(w, block_size=8, ell_blocks=2)
    b = _rand(rng, (64, 8))
    with _pytest.raises(ValueError, match="split_n"):
        spmm_ell(e, b, gather_db=True, split_n=2)
