"""COO SpMM tests: shared sparse operand, batched dense B (SURVEY.md C3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.ops.coo import (
    coo_from_dense,
    coo_to_ell,
    spmm_coo,
)
from sparsifyme_tpu.ops.ell import ell_to_dense, spmm_ell
from sparsifyme_tpu.ops.prune import prune_threshold


def _sparse(rng, m, k, density=0.1):
    w = rng.normal(size=(m, k)).astype(np.float32)
    mask = rng.random((m, k)) < density
    return w * mask


def test_coo_from_dense_roundtrip(rng):
    w = _sparse(rng, 32, 48)
    a = coo_from_dense(w)
    np.testing.assert_array_equal(np.asarray(a.todense()), w)


def test_coo_nnz_padding(rng):
    w = _sparse(rng, 16, 16, density=0.2)
    actual = int((w != 0).sum())
    a = coo_from_dense(w, nnz=actual + 7)
    assert a.nnz == actual + 7
    np.testing.assert_allclose(np.asarray(a.todense()), w, atol=1e-7)


def test_spmm_coo_single(rng):
    w = _sparse(rng, 32, 64)
    a = coo_from_dense(w)
    b = jnp.asarray(rng.normal(size=(64, 24)), jnp.float32)
    got = spmm_coo(a, b, out_dtype=jnp.float32)
    want = w.astype(np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spmm_coo_batched_shared_a(rng):
    # The stride-0 strided-batch semantics (spmm.hxx:169): one A, many B.
    w = _sparse(rng, 16, 32)
    a = coo_from_dense(w)
    b = jnp.asarray(rng.normal(size=(4, 32, 8)), jnp.float32)
    got = spmm_coo(a, b, out_dtype=jnp.float32)
    assert got.shape == (4, 16, 8)
    for i in range(4):
        want = w.astype(np.float64) @ np.asarray(b[i], np.float64)
        np.testing.assert_allclose(
            np.asarray(got[i]), want, rtol=1e-4, atol=1e-4
        )


def test_coo_sparsity_sweep(rng):
    # The 50-90% sparsity sweep capability (BASELINE configs[2]).
    for density in (0.5, 0.25, 0.1):
        w = _sparse(rng, 32, 32, density)
        a = coo_from_dense(w)
        b = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
        got = spmm_coo(a, b, out_dtype=jnp.float32)
        want = w.astype(np.float64) @ np.asarray(b, np.float64)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_coo_to_ell_conversion(rng):
    w = _sparse(rng, 32, 64, density=0.1)
    a = coo_from_dense(w)
    e = coo_to_ell(a, block_size=8)
    np.testing.assert_allclose(np.asarray(ell_to_dense(e)), w, atol=1e-7)
    # And the converted matrix multiplies correctly via the ELL path.
    b = jnp.asarray(rng.normal(size=(64, 16)), jnp.float32)
    got = spmm_ell(e, b, out_dtype=jnp.float32)
    want = w.astype(np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_coo_to_ell_threshold_pipeline(rng):
    # magnitude-threshold prune -> COO -> ELL (BASELINE configs[0] flow).
    w = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    pruned, _ = prune_threshold(w, 1.5)
    a = coo_from_dense(np.asarray(pruned))
    e = coo_to_ell(a, block_size=8)
    np.testing.assert_allclose(
        np.asarray(ell_to_dense(e)), np.asarray(pruned), atol=1e-7
    )


@pytest.mark.parametrize("density", [0.5, 0.3, 0.1])
@pytest.mark.parametrize("shape", [(256, 384, 96), (200, 130, 64),
                                   (128, 128, 128)])
def test_coo_segmented_kernel_matches_oracle(rng, density, shape):
    # Pallas segmented block-row kernel vs the XLA gather/segment-sum
    # oracle, at the cross-check's sparsity levels (50/70/90%).
    from sparsifyme_tpu.ops.coo import spmm_coo_segmented

    m, k, n = shape
    w = _sparse(rng, m, k, density=density)
    a = coo_from_dense(w)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    want = spmm_coo(a, b, out_dtype=jnp.float32)
    got = spmm_coo_segmented(a, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_coo_segmented_batched_shared_a(rng):
    # Shared sparse A broadcast over batched B (stride-0 semantics);
    # batch folds into the n axis.
    from sparsifyme_tpu.ops.coo import spmm_coo_segmented

    w = _sparse(rng, 128, 96, density=0.2)
    a = coo_from_dense(w)
    b = jnp.asarray(rng.normal(size=(4, 96, 48)), jnp.float32)
    want = spmm_coo(a, b, out_dtype=jnp.float32)
    got = spmm_coo_segmented(a, b, out_dtype=jnp.float32)
    assert got.shape == (4, 128, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_coo_segmented_duplicate_entries():
    # Duplicate (row, col) pairs must accumulate (one-hot matmul sums).
    from sparsifyme_tpu.containers import Coo
    from sparsifyme_tpu.ops.coo import spmm_coo_segmented

    a = Coo(rows=jnp.asarray([0, 0, 5, 5], jnp.int32),
            cols=jnp.asarray([1, 1, 2, 2], jnp.int32),
            values=jnp.asarray([1.0, 2.0, 3.0, 4.0], jnp.float32),
            shape=(8, 8))
    b = jnp.eye(8, dtype=jnp.float32)
    got = np.asarray(spmm_coo_segmented(a, b, out_dtype=jnp.float32))
    assert got[0, 1] == 3.0 and got[5, 2] == 7.0
    assert got.sum() == 10.0


def test_spmm_coo_batch_chunk_matches_vmap(rng):
    """lax.map-chunked oracle == unchunked vmap (the chunked path is
    what config2 times — the unchunked gather OOMs HBM at 50%
    sparsity on 196-class shapes)."""
    import jax.numpy as jnp
    import numpy as np
    from sparsifyme_tpu.ops.coo import coo_from_dense, spmm_coo

    a = rng.normal(size=(100, 64)).astype(np.float32)
    a[np.abs(a) < 0.7] = 0
    coo = coo_from_dense(a, nnz=4096)
    b = jnp.asarray(rng.normal(size=(8, 64, 32)), jnp.bfloat16)
    want = np.asarray(spmm_coo(coo, b, out_dtype=jnp.float32))
    got = np.asarray(spmm_coo(coo, b, out_dtype=jnp.float32,
                              batch_chunk=4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matmul_gather_wide_k_guard():
    """Very wide k must fail fast with an actionable ValueError (not an
    opaque Mosaic/VMEM compile error): the one-hot matmul gather keeps
    [kp, bn] B resident in VMEM (ADVICE r3)."""
    import jax.numpy as jnp
    import pytest

    from sparsifyme_tpu.ops.kernels.coo_kernel import spmm_coo_pallas

    k = 131072
    vals2 = jnp.zeros((1, 128), jnp.float32)
    cols2 = jnp.zeros((1, 128), jnp.int32)
    roff2 = jnp.zeros((1, 128), jnp.int32)
    b = jnp.zeros((k, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="VMEM"):
        spmm_coo_pallas(vals2, cols2, roff2, b, m=128,
                        gather="matmul", interpret=False)
