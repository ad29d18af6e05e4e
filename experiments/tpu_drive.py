"""Verify drive on the real TPU: prune->check->compress->spmm_24 (std,
tout, and FP kernel), ell_from_dense->spmm_ell, small-block fallback,
unaligned shapes, batched shared-B — all vs the *_reference oracles."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from sparsifyme_tpu.ops.prune import prune_nm, prune_check_nm
from sparsifyme_tpu.ops.sparse24 import (
    compress_24, spmm_24, spmm_24_reference)
from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp
from sparsifyme_tpu.ops.ell import ell_from_dense, spmm_ell, \
    spmm_ell_reference


def relerr(got, want):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    return float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))


def check(name, got, want, tol=2e-2):
    e = relerr(got, want)
    status = "OK" if e < tol else "FAIL"
    print(f"  {name}: rel_err={e:.3e} {status}")
    assert e < tol, name


def main():
    print("backend:", jax.default_backend(), jax.devices())
    key = jax.random.PRNGKey(0)
    # ResNet-50 shape, batched, bf16.
    b, m, n, k = 4, 784, 256, 1024
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bm = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    pruned, mask = jax.jit(lambda x: prune_nm(x, 2, 4))(a)
    ok = jax.jit(lambda x: prune_check_nm(x, 2, 4))(pruned)
    assert bool(ok), "prune_check failed"
    s = jax.jit(compress_24)(pruned)
    want = spmm_24_reference(s, bm, out_dtype=jnp.float32)
    check("spmm_24 batched", spmm_24(s, bm, out_dtype=jnp.float32), want)
    got_t = spmm_24(s, bm, out_dtype=jnp.float32, transpose_out=True)
    check("spmm_24 tout", np.asarray(got_t).T.reshape(b, m, n), want)
    kp = 4 * s.values0.shape[0]
    bpad = jnp.pad(bm, ((0, kp - k), (0, 0)))
    got_fp = spmm24_pallas_fp(s.values0, s.values1, s.codes, bpad,
                              k_logical=k, out_dtype=jnp.float32)
    check("spmm24 FP", np.asarray(got_fp).reshape(b, m, n), want)
    got_fpt = spmm24_pallas_fp(s.values0, s.values1, s.codes, bpad,
                               k_logical=k, out_dtype=jnp.float32,
                               transpose_out=True)
    check("spmm24 FP tout", np.asarray(got_fpt).T.reshape(b, m, n), want)

    # Unaligned (padding paths), f32.
    a2 = jax.random.normal(key, (100, 148), jnp.float32)
    b2 = jax.random.normal(key, (148, 96), jnp.float32)
    p2, _ = jax.jit(lambda x: prune_nm(x, 2, 4))(a2)
    s2 = jax.jit(compress_24)(p2)
    check("spmm_24 unaligned f32", spmm_24(s2, b2, out_dtype=jnp.float32),
          spmm_24_reference(s2, b2, out_dtype=jnp.float32), tol=1e-4)
    kp2 = 4 * s2.values0.shape[0]
    check("spmm24 FP unaligned", spmm24_pallas_fp(
        s2.values0, s2.values1, s2.codes,
        jnp.pad(b2, ((0, kp2 - 148), (0, 0))), k_logical=148,
        out_dtype=jnp.float32)[:100],
        spmm_24_reference(s2, b2, out_dtype=jnp.float32), tol=1e-4)

    # ELL block 128 + rectangular k-edge (rows must divide 128 after
    # the batch fold: 4*768 = 3072 = 24*128).
    aell = a[:, :768, :]
    e = jax.jit(lambda x: ell_from_dense(x, block_size=128, ell_blocks=4,
                                         block_k=64))(aell)
    check("spmm_ell 128x64", spmm_ell(e, bm, out_dtype=jnp.float32),
          spmm_ell_reference(e, bm, out_dtype=jnp.float32))

    # Fused prune+compress (round-2): bit-identical planes to the
    # two-phase pipeline, both variants, on the real Mosaic lowering.
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)
    from sparsifyme_tpu.ops.sparse24 import prune_compress_24

    for km in (True, False):
        fv0, fv1, fcodes = prune_compress_24_pallas(
            a.reshape(-1, k), kmajor=km)
        assert np.array_equal(np.asarray(fv0), np.asarray(s.values0)), km
        assert np.array_equal(np.asarray(fv1), np.asarray(s.values1)), km
        assert np.array_equal(np.asarray(fcodes), np.asarray(s.codes)), km
    print("  fused prune+compress: planes bit-identical OK")
    sf = jax.jit(prune_compress_24)(a)
    check("fused op spmm parity", spmm_24(sf, bm, out_dtype=jnp.float32),
          want)

    # Segmented block-row COO kernel vs the XLA oracle (round-2).
    from sparsifyme_tpu.ops.coo import (coo_from_dense, spmm_coo,
                                        spmm_coo_segmented)

    wc = np.asarray(jax.random.normal(key, (256, 384), jnp.float32)).copy()
    wc[np.asarray(jax.random.uniform(key, (256, 384))) > 0.3] = 0.0
    coo = coo_from_dense(wc)
    bc = jax.random.normal(key, (4, 384, 96), jnp.float32)
    check("coo segmented batched",
          spmm_coo_segmented(coo, bc, out_dtype=jnp.float32),
          spmm_coo(coo, bc, out_dtype=jnp.float32), tol=1e-4)

    # Small-block ELL on TPU: must warn + fall back, not crash.
    e8 = jax.jit(lambda x: ell_from_dense(x[0, :128, :128], block_size=8,
                                          ell_blocks=4))(a)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        out8 = spmm_ell(e8, bm[:128], out_dtype=jnp.float32)
        assert any("densify" in str(w.message) or "falling back"
                   in str(w.message) for w in wlist), "no fallback warning"
    check("spmm_ell bs=8 fallback", out8,
          spmm_ell_reference(e8, bm[:128], out_dtype=jnp.float32))
    print("ALL OK")


if __name__ == "__main__":
    main()
