"""2:4 compress/decompress/SpMM tests.

Covers the pipeline identities from SURVEY.md §4(b):
  spmm_24(compress(prune(A)), B) == decompress(compress(prune(A))) @ B exactly
  (structure-faithful) and ~= A @ B within pruning error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.containers import Sparse24
from sparsifyme_tpu.ops.prune import prune_24
from sparsifyme_tpu.ops.sparse24 import (
    compress_24,
    decompress_24,
    pack_codes,
    spmm_24,
    spmm_24_reference,
    unpack_codes,
)


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.normal(size=shape), dtype)


def test_compress_decompress_roundtrip(rng):
    w = _rand(rng, (32, 64))
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    assert s.values0.shape == (16, 32)  # k-major [k4, m]
    assert s.codes.dtype == jnp.uint8
    back = decompress_24(s)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pruned))


def test_compress_codes_valid(rng):
    w = _rand(rng, (16, 32))
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    codes = np.asarray(s.codes)
    i0, i1 = codes >> 2, codes & 3
    assert (i0 < i1).all() and (i1 < 4).all()


def test_compress_unpadded_k(rng):
    w = _rand(rng, (8, 10))
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    back = decompress_24(s)
    assert back.shape == (8, 10)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pruned))


def test_compress_batched(rng):
    w = _rand(rng, (3, 8, 16))
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    back = decompress_24(s)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pruned))


def test_pack_unpack_codes(rng):
    w = _rand(rng, (8, 64))
    s = compress_24(prune_24(w)[0])
    packed = pack_codes(s.codes)
    assert packed.shape == (8, 8)  # [k4/2, m]
    np.testing.assert_array_equal(
        np.asarray(unpack_codes(packed, 16)), np.asarray(s.codes)
    )


@pytest.mark.parametrize(
    "m,k,n",
    [
        (32, 64, 32),          # tiny
        (64, 128, 128),        # aligned
        (100, 148, 96),        # unaligned everywhere (k % 4 == 0)
        (256, 512, 256),       # one full tile
        (196, 2048, 512),      # a real ResNet-50 shape
    ],
)
def test_spmm24_matches_dense_oracle(rng, m, k, n):
    a = _rand(rng, (m, k))
    b = _rand(rng, (k, n))
    pruned, _ = prune_24(a)
    s = compress_24(pruned)
    got = spmm_24(s, b, out_dtype=jnp.float32)
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_bf16(rng):
    a = _rand(rng, (64, 256), jnp.bfloat16)
    b = _rand(rng, (256, 128), jnp.bfloat16)
    pruned, _ = prune_24(a)
    s = compress_24(pruned)
    got = spmm_24(s, b, out_dtype=jnp.float32)
    want = spmm_24_reference(s, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_spmm24_batched_shared_b(rng):
    # The reference's shared-B batched convention (spmm.hxx:67).
    a = _rand(rng, (4, 32, 64))
    b = _rand(rng, (64, 48))
    pruned, _ = prune_24(a)
    s = compress_24(pruned)
    got = spmm_24(s, b, out_dtype=jnp.float32)
    assert got.shape == (4, 32, 48)
    for i in range(4):
        want = np.asarray(pruned[i], np.float64) @ np.asarray(b, np.float64)
        np.testing.assert_allclose(
            np.asarray(got[i]), want, rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize(
    "m,k,n,tout",
    [
        (32, 64, 32, False),
        (100, 148, 96, False),      # unaligned everywhere
        (100, 148, 96, True),
        (64, 2304, 80, False),      # multi-k-tile accumulate
        (64, 2304, 80, True),
        (300, 512, 256, True),      # multi-m-tile pipeline
    ],
)
def test_spmm24_fp_matches_dense_oracle(rng, m, k, n, tout):
    # The pipelined kernel (expand(t) overlaps dot(t-1)) against the
    # dense oracle, both output layouts, forced small tiles so the
    # flattened (m-tile x k-tile) pipeline takes multiple steps.
    from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp

    a = _rand(rng, (m, k))
    b = _rand(rng, (k, n))
    pruned, _ = prune_24(a)
    s = compress_24(pruned)
    kp = 4 * s.values0.shape[0]
    bp = jnp.pad(b, ((0, kp - k), (0, 0)))
    got = spmm24_pallas_fp(
        s.values0, s.values1, s.codes, bp, k_logical=k,
        out_dtype=jnp.float32, transpose_out=tout,
        block_m=128, block_k4=16,
    )
    if tout:
        got = got.T
    want = np.asarray(pruned, np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_transpose_out_direct(rng):
    # Direct numerics of spmm_24(transpose_out=True) — round-1 VERDICT
    # test gap: this is the layout SparseConv2d's forward uses.
    a = _rand(rng, (48, 64))
    b = _rand(rng, (64, 40))
    s = compress_24(prune_24(a)[0])
    got = spmm_24(s, b, out_dtype=jnp.float32, transpose_out=True)
    want = (np.asarray(decompress_24(s), np.float64)
            @ np.asarray(b, np.float64)).T
    assert got.shape == (40, 48)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_alpha_beta_epilogue(rng):
    # C = alpha*AB + beta*C vs the dense oracle (reference epilogue
    # contract, spmma.hxx:22-31), round-1 VERDICT parity gap.
    a = _rand(rng, (32, 64))
    b = _rand(rng, (64, 48))
    c = _rand(rng, (32, 48))
    s = compress_24(prune_24(a)[0])
    got = spmm_24(s, b, out_dtype=jnp.float32, alpha=0.5, beta=-2.0, c=c)
    dense = np.asarray(decompress_24(s), np.float64) @ np.asarray(
        b, np.float64)
    want = 0.5 * dense + (-2.0) * np.asarray(c, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_fp_alpha_beta_fused(rng):
    # The FP kernel's in-store epilogue.
    from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp

    a = _rand(rng, (64, 96))
    b = _rand(rng, (96, 32))
    c = _rand(rng, (64, 32))
    s = compress_24(prune_24(a)[0])
    got = spmm24_pallas_fp(
        s.values0, s.values1, s.codes, b, c, k_logical=96,
        out_dtype=jnp.float32, alpha=2.0, beta=0.25)
    dense = np.asarray(decompress_24(s), np.float64) @ np.asarray(
        b, np.float64)
    want = 2.0 * dense + 0.25 * np.asarray(c, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_transpose_b(rng):
    a = _rand(rng, (32, 64))
    bt = _rand(rng, (48, 64))  # [n, k]: op(B) = B^T
    s = compress_24(prune_24(a)[0])
    got = spmm_24(s, bt, out_dtype=jnp.float32, transpose_b=True)
    want = np.asarray(decompress_24(s), np.float64) @ np.asarray(
        bt, np.float64).T
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm24_transpose_a_rejected(rng):
    a = _rand(rng, (32, 64))
    s = compress_24(prune_24(a)[0])
    with pytest.raises(NotImplementedError, match="contraction axis"):
        spmm_24(s, _rand(rng, (32, 16)), transpose_a=True)


def test_spmm24_transpose_out_vjp(rng):
    # Round-1 gap: transpose_out had no VJP (the layout SparseConv2d's
    # forward uses). Gradients must match the reference path.
    a = _rand(rng, (16, 32), jnp.float32)
    s = compress_24(prune_24(a)[0])
    b = _rand(rng, (32, 24), jnp.float32)

    def loss_kernel(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        out = spmm_24(s2, bb, out_dtype=jnp.float32, transpose_out=True)
        return jnp.sum(out ** 2)

    def loss_ref(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        return jnp.sum(spmm_24_reference(s2, bb, out_dtype=jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(s.values0, s.values1, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s.values0, s.values1, b)
    for got, want in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_spmm24_grad_flows(rng):
    # The op composes with JAX autodiff through B (training capability).
    a = _rand(rng, (16, 32))
    s = compress_24(prune_24(a)[0])

    def loss(b):
        return jnp.sum(spmm_24(s, b, out_dtype=jnp.float32) ** 2)

    b = _rand(rng, (32, 16))
    g = jax.grad(loss)(b)
    assert g.shape == b.shape
    assert bool(jnp.any(g != 0))


def test_spmm24_vjp_matches_reference(rng):
    # Custom-VJP gradients vs autodiff of the dense-oracle path, both
    # w.r.t. the compressed values and w.r.t. B.
    a = _rand(rng, (16, 32), jnp.float32)
    s = compress_24(prune_24(a)[0])
    b = _rand(rng, (32, 24), jnp.float32)

    def loss_kernel(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        return jnp.sum(spmm_24(s2, bb, out_dtype=jnp.float32) ** 2)

    def loss_ref(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        return jnp.sum(spmm_24_reference(s2, bb, out_dtype=jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(s.values0, s.values1, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s.values0, s.values1, b)
    for got, want in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_spmm24_vjp_batched(rng):
    a = _rand(rng, (2, 8, 16), jnp.float32)
    s = compress_24(prune_24(a)[0])
    b = _rand(rng, (16, 8), jnp.float32)

    def loss_kernel(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        return jnp.sum(spmm_24(s2, bb, out_dtype=jnp.float32) ** 2)

    def loss_ref(v0, v1, bb):
        s2 = Sparse24(v0, v1, s.codes, shape=s.shape)
        return jnp.sum(spmm_24_reference(s2, bb, out_dtype=jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(s.values0, s.values1, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(s.values0, s.values1, b)
    for got, want in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_packed_codes_fp_kernel(rng):
    """Split-half packed codes through the pipelined kernel: planes are
    bit-identical to the unpacked path (the 1.78x-ceiling storage)."""
    from sparsifyme_tpu.ops.sparse24 import pack_codes_fp
    from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp

    for (bsz, m, k, n) in ((2, 14, 147, 16), (1, 16, 256, 24)):
        a = _rand(rng, (bsz, m, k), jnp.bfloat16)
        s = compress_24(prune_24(a)[0])
        b = _rand(rng, (k, n), jnp.bfloat16)
        kp = 4 * s.values0.shape[0]
        bp = jnp.pad(b, ((0, kp - k), (0, 0)))
        want = spmm24_pallas_fp(s.values0, s.values1, s.codes, bp,
                                k_logical=k, out_dtype=jnp.float32)
        cp = pack_codes_fp(s.codes)
        assert cp.shape[0] == s.codes.shape[0] // 2
        got = spmm24_pallas_fp(s.values0, s.values1, cp, bp,
                               k_logical=k, out_dtype=jnp.float32,
                               packed_codes=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spmm24_packed_codes_api(rng):
    """spmm_24(packed_codes=True) — the op-level packed path the plan
    uses (round-4 wiring of VERDICT r3 item 6) — matches the reference
    oracle bit-for-bit vs the unpacked pipelined path."""
    w = _rand(rng, (2, 64, 96), jnp.bfloat16)
    bm = _rand(rng, (96, 48), jnp.bfloat16)
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    want = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True)
    got = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                  packed_codes=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    with pytest.raises(ValueError):
        spmm_24(s, bm, pipeline=False, packed_codes=True)


def test_plan_uses_packed_table_entry():
    """A shape whose committed tuning-table winner is packed (e.g.
    12544x64x256x32) must surface packed=True in the plan's algorithm
    tuple — the production API reaches the tuner's fastest config
    (plan construction only: abstract eval, no device compute)."""
    from sparsifyme_tpu.bench.tuning import load_table
    from sparsifyme_tpu.plan import SpmmaConfig, SpmmaPlan

    packed_keys = [k for k, e in load_table().items()
                   if e.get("spmm24", {}).get("packed")]
    if not packed_keys:
        pytest.skip("no packed winners in the committed table")
    m, n, k, b = map(int, packed_keys[0].split("x"))
    plan = SpmmaPlan(SpmmaConfig(m=m, n=n, k=k, batch=b,
                                 out_dtype="bfloat16"))
    assert plan.algorithm[5] is True


@pytest.mark.parametrize("kcfg", [(256, None), (1024, 64)])  # n_k 1 / >1
@pytest.mark.parametrize("tout", [False, True])
def test_spmm24_fp_row_chunks(rng, kcfg, tout):
    """Chunk-interleaved pipelined kernel (row_chunks > 1): bit-identical
    to the whole-slab path for single- and multi-k-step grids."""
    k, bk4 = kcfg
    w = _rand(rng, (256, k), jnp.bfloat16)
    bm = _rand(rng, (k, 64), jnp.bfloat16)
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    want = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                   block_m=256, block_k4=bk4, transpose_out=tout)
    got = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                  block_m=256, block_k4=bk4, transpose_out=tout,
                  row_chunks=2)
    # f32 reduction-order noise across different output tilings
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_spmm24_fp_budget_override(rng):
    w = _rand(rng, (128, 256), jnp.bfloat16)
    bm = _rand(rng, (256, 64), jnp.bfloat16)
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    want = spmm_24_reference(s, bm, out_dtype=jnp.float32)
    got = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                  budget_mb=24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("kcfg", [(256, None), (1024, 64)])  # n_k 1 / >1
@pytest.mark.parametrize("kc", [2, 4])
def test_spmm24_fp_k_chunks(rng, kcfg, kc):
    """Quarter-axis interleaved pipelined kernel (k_chunks > 1, the
    round-5 overlap candidate): matches the whole-slab path."""
    k, bk4 = kcfg
    w = _rand(rng, (256, k), jnp.bfloat16)
    bm = _rand(rng, (k, 64), jnp.bfloat16)
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    want = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                   block_m=256, block_k4=bk4)
    got = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                  block_m=256, block_k4=bk4, k_chunks=kc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_spmm24_k_chunks_row_chunks_exclusive(rng):
    w = _rand(rng, (128, 256), jnp.bfloat16)
    bm = _rand(rng, (256, 64), jnp.bfloat16)
    pruned, _ = prune_24(w)
    s = compress_24(pruned)
    with pytest.raises(ValueError, match="mutually exclusive"):
        spmm_24(s, bm, pipeline=True, row_chunks=2, k_chunks=2)


# ---------------------------------------------------------------------------
# Folded-plane layout (round 5): fused prune+compress emits fold=2
# planes end-to-end and spmm24_fold_pallas consumes them directly.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mk", [(64, 64), (32, 147), (128, 128)])
def test_prune_compress_folded_matches_unfolded(rng, mk):
    """fold=2 planes carry the SAME selection as the standard layout —
    un-folding them reproduces the fold=1 planes bit-for-bit."""
    from sparsifyme_tpu.ops.sparse24 import (_unfold_planes,
                                             prune_compress_24)

    m, k = mk
    w = _rand(rng, (m, k), jnp.bfloat16)
    s1 = prune_compress_24(w)
    s2 = prune_compress_24(w, fold=2)
    assert s2.fold == 2
    k4 = s1.values0.shape[0]
    assert s2.values0.shape == (2 * k4, m // 2)
    for p1, p2 in ((s1.values0, s2.values0), (s1.values1, s2.values1),
                   (s1.codes, s2.codes)):
        np.testing.assert_array_equal(
            np.asarray(_unfold_planes(p2, 2, k4, m)), np.asarray(p1))


@pytest.mark.parametrize("mkn", [(64, 64, 64), (32, 147, 24),
                                 (128, 256, 96)])
def test_spmm24_folded_matches_oracle(rng, mkn):
    """spmm_24 on a folded operand == the dense oracle on the unfolded
    decompress — no un-interleave anywhere in the pipeline."""
    from sparsifyme_tpu.ops.sparse24 import prune_compress_24

    m, k, n = mkn
    w = _rand(rng, (m, k), jnp.bfloat16)
    bm = _rand(rng, (k, n), jnp.bfloat16)
    s2 = prune_compress_24(w, fold=2)
    want = spmm_24_reference(s2, bm, out_dtype=jnp.float32)
    got = spmm_24(s2, bm, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_spmm24_folded_batched(rng):
    from sparsifyme_tpu.ops.sparse24 import prune_compress_24

    w = _rand(rng, (4, 32, 64), jnp.bfloat16)
    bm = _rand(rng, (64, 48), jnp.bfloat16)
    s2 = prune_compress_24(w, fold=2)
    want = spmm_24_reference(s2, bm, out_dtype=jnp.float32)
    got = spmm_24(s2, bm, out_dtype=jnp.float32)
    assert got.shape == (4, 32, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_spmm24_folded_transpose_out_rejected(rng):
    from sparsifyme_tpu.ops.sparse24 import prune_compress_24

    w = _rand(rng, (32, 64), jnp.bfloat16)
    bm = _rand(rng, (64, 16), jnp.bfloat16)
    s2 = prune_compress_24(w, fold=2)
    with pytest.raises(NotImplementedError, match="folded"):
        spmm_24(s2, bm, transpose_out=True)
