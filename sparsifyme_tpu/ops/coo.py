"""Strided-batched COO SpMM (one shared sparse operand).

TPU-native equivalent of the reference's `batched::strided_coo`
(`include/sparsify.me/spmm.hxx:140-193`): one COO sparse A broadcast over
all batches (`cusparseCooSetStridedBatch(matA, num_batches, 0)` — stride 0,
`spmm.hxx:169`), batched dense B and C. The reference version is WIP and
does not compile (SURVEY.md C3); the capability carried forward is batched
COO SpMM with a shared sparse operand, plus the format-conversion-cost
accounting of the PyTorch cross-check (`profiling/python/gemm_coo_compare.py`).

On TPU, scattered scalar access cannot feed the MXU, so there are two
execution strategies:

* :func:`spmm_coo` — direct gather/segment-sum formulation (XLA): fine for
  very high sparsity where nnz is small.
* :func:`coo_to_ell` + :func:`~.ell.spmm_ell` — convert to Blocked-ELL and
  run the MXU gather kernel; the conversion cost is measured separately,
  mirroring the reference cross-check's "include to_sparse() time"
  methodology (`gemm_coo_compare.py:9-43`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..containers import BlockedEll, Coo


def coo_from_dense(w, nnz: Optional[int] = None) -> Coo:
    """Build a Coo from a concrete (host) dense matrix.

    Not jittable — nnz is data-dependent (fixed at trace time by padding
    to ``nnz`` with explicit zeros at (0, 0) if requested). Rows are sorted
    row-major like the reference driver's generator sorts its indices.
    """
    wn = np.asarray(w)
    m, k = wn.shape
    rows, cols = np.nonzero(wn)
    vals = wn[rows, cols]
    if nnz is not None:
        if nnz < len(vals):
            raise ValueError(f"nnz {nnz} < actual nonzeros {len(vals)}")
        pad = nnz - len(vals)
        rows = np.concatenate([rows, np.zeros(pad, rows.dtype)])
        cols = np.concatenate([cols, np.zeros(pad, cols.dtype)])
        vals = np.concatenate([vals, np.zeros(pad, vals.dtype)])
    return Coo(
        rows=jnp.asarray(rows, jnp.int32),
        cols=jnp.asarray(cols, jnp.int32),
        values=jnp.asarray(vals),
        shape=(m, k),
    )


def spmm_coo(a: Coo, b: jax.Array, *, out_dtype=None,
             batch_chunk: Optional[int] = None) -> jax.Array:
    """C[..., m, n] = A @ B[..., k, n] with A shared across batch dims.

    Gather rows of B at A's column coords, scale by A's values, and
    segment-sum into C's rows. Padded entries (value 0) contribute nothing.

    ``batch_chunk``: process the (flattened) batch in sequential chunks
    of this size via `lax.map`. The gather materializes an
    ``[batch_chunk, nnz, n]`` f32 intermediate — an unchunked vmap at
    low sparsity OOMs HBM (measured: 18.6 GB at 50% on 196x2048-class
    shapes, b=32).
    """
    m, _ = a.shape
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)

    def one(bmat):
        # f32 accumulation regardless of operand dtype: this is the
        # oracle the Pallas kernel (f32 HIGHEST-precision scatter
        # matmul) is checked against — a bf16 segment_sum would make
        # the oracle less precise than the kernel under test.
        gathered = (bmat[a.cols].astype(jnp.float32)
                    * a.values[:, None].astype(jnp.float32))
        return jax.ops.segment_sum(gathered, a.rows, num_segments=m)

    batch_dims = b.ndim - 2
    if batch_chunk and batch_dims:
        *lead, k, n = b.shape
        import numpy as np

        bsz = int(np.prod(lead))
        if bsz % batch_chunk:
            raise ValueError(
                f"batch {bsz} not divisible by batch_chunk {batch_chunk}")
        b3 = b.reshape(bsz // batch_chunk, batch_chunk, k, n)
        out = jax.lax.map(jax.vmap(one), b3)
        return out.reshape(*lead, m, n).astype(out_dtype)
    f = one
    for _ in range(batch_dims):
        f = jax.vmap(f)
    return f(b).astype(out_dtype)


def coo_to_dense(a: Coo) -> jax.Array:
    return a.todense()


def coo_to_ell(
    a: Coo, block_size: int, ell_blocks: Optional[int] = None
) -> BlockedEll:
    """Convert COO to Blocked-ELL (format-conversion path to the MXU
    kernel). Host-side — conversion is a data-dependent repacking, exactly
    the cost the reference cross-check measures.

    ``ell_blocks`` defaults to the max occupied blocks over block-rows.
    Raises if any block-row needs more than ``ell_blocks`` blocks.
    """
    m, k = a.shape
    bs = block_size
    if m % bs or k % bs:
        raise ValueError(f"{a.shape} not divisible by block_size {bs}")
    mb, kb = m // bs, k // bs
    rows = np.asarray(a.rows)
    cols = np.asarray(a.cols)
    vals = np.asarray(a.values)
    keep = vals != 0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]
    brow, bcol = rows // bs, cols // bs
    occupied = [
        np.unique(bcol[brow == r]) for r in range(mb)
    ]
    need = max((len(o) for o in occupied), default=0) or 1
    if ell_blocks is None:
        ell_blocks = need
    elif need > ell_blocks:
        raise ValueError(f"need {need} blocks/row > ell_blocks {ell_blocks}")
    values = np.zeros((m, ell_blocks * bs), vals.dtype)
    col_indices = np.zeros((mb, ell_blocks), np.int32)
    for r in range(mb):
        occ = occupied[r]
        # Pad unoccupied slots with distinct unused columns where possible
        # (indices must be valid; duplicate zero-blocks are harmless as the
        # padded values are zero).
        col_indices[r, : len(occ)] = occ
        slot_of = {c: j for j, c in enumerate(occ)}
        sel = brow == r
        rr, cc, vv = rows[sel], cols[sel], vals[sel]
        j = np.array([slot_of[c] for c in cc // bs], np.int64)
        values[rr, j * bs + (cc % bs)] = vv
    return BlockedEll(
        values=jnp.asarray(values),
        col_indices=jnp.asarray(col_indices),
        shape=(m, k),
        block_size=bs,
    )


def pack_coo(a: Coo, block_rows: int = 128):
    """Host-side segment packing for the Pallas kernel (format-build
    step, measured separately like the reference cross-check's
    ``to_sparse()`` conversion accounting)."""
    from .kernels.coo_kernel import pack_coo_blockrows

    vals2, cols2, roff2 = pack_coo_blockrows(
        np.asarray(a.rows), np.asarray(a.cols), np.asarray(a.values),
        a.shape[0], block_rows=block_rows,
    )
    return jnp.asarray(vals2), jnp.asarray(cols2), jnp.asarray(roff2)


def spmm_coo_segmented(
    a: Coo,
    b: jax.Array,
    *,
    out_dtype=None,
    block_rows: int = 128,
    packed: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    gather: str = "auto",
) -> jax.Array:
    """Segmented block-row COO SpMM on the MXU (Pallas kernel).

    The device-kernel formulation of :func:`spmm_coo` (which remains the
    XLA oracle): entries are packed per block-row of C, B rows are
    gathered via scalar-prefetched column indices, and the segment
    reduction runs as a one-hot scatter matmul — see
    :mod:`.kernels.coo_kernel`. A shared sparse A broadcasts over batch
    dims of ``b`` by folding batch into the n axis (the stride-0
    semantics of `cusparseCooSetStridedBatch`, `spmm.hxx:169`).

    ``packed``: pre-packed ``pack_coo(a, block_rows)`` output so the
    host-side conversion cost stays out of the hot loop.
    """
    from .kernels.coo_kernel import spmm_coo_pallas

    m, k = a.shape
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    if packed is None:
        packed = pack_coo(a, block_rows)
    vals2, cols2, roff2 = packed
    lead = b.shape[:-2]
    n = b.shape[-1]
    b2 = jnp.moveaxis(b.reshape(-1, k, n), 0, 1).reshape(k, -1)
    out = spmm_coo_pallas(
        vals2, cols2, roff2, b2, m=m, block_rows=block_rows,
        out_dtype=jnp.float32, gather=gather,
    )
    if lead:
        out = jnp.moveaxis(out.reshape(m, -1, n), 1, 0)
        return out.reshape(*lead, m, n).astype(out_dtype)
    return out.reshape(m, n).astype(out_dtype)
