"""Pallas MXU kernel: batched Blocked-ELL SpMM (gather-of-dense-tiles).

The device-side core of the reference's batched Blocked-ELL SpMM
(`cusparseSpMM` on `cusparseCreateBlockedEll` descriptors,
`include/sparsify.me/spmm.hxx:50-115`), designed TPU-first:

* The sparse A is stored as packed dense blocks (values ``[.., m,
  ell_blocks*bs]``) plus per-block-row block-column indices. Unlike the
  reference's 2x2 blocks, block sizes are MXU-scaled (>= 8, typically 128),
  so every kept block is a full systolic-array matmul and every *skipped*
  block is real FLOPs saved — the TPU replacement for sparse tensor cores.
* The block-column indices are scalar-prefetched
  (`pltpu.PrefetchScalarGridSpec`), so the pipeline's DMA engine gathers
  exactly the B row-blocks each kept A block needs, one tile ahead of
  compute — no scalar-core stalls on the irregular access.
* The reference's OpenMP-threads x CUDA-streams batch fan-out
  (`spmm.hxx:94`) becomes a batch grid dimension.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm24_kernel import _cdiv, _round_up, default_interpret


def _kernel(col_ref, val_ref, b_ref, out_ref, acc_ref, *, n_ell: int):
    kk = pl.program_id(3)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        val_ref[0], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_ell - 1)
    def _store():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "out_dtype", "block_n", "interpret"),
)
def ell_spmm_pallas(
    values: jax.Array,       # [batch, m, ell_blocks * bs]
    col_indices: jax.Array,  # [batch, m_blocks, ell_blocks] int32
    b: jax.Array,            # [k, n] shared dense operand
    *,
    block_size: int,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """C[batch, m, n] = BlockedEll(values, col_indices) @ b, batched."""
    if interpret is None:
        interpret = default_interpret()
    bs = block_size
    batch, m, ellk = values.shape
    n_ell = ellk // bs
    mb = m // bs
    k, n = b.shape
    if col_indices.shape != (batch, mb, n_ell):
        raise ValueError(
            f"col_indices {col_indices.shape} != {(batch, mb, n_ell)}"
        )
    if k % bs:
        b = jnp.pad(b, ((0, _round_up(k, bs) - k), (0, 0)))

    bn = block_n or min(_round_up(n, 128), 512)
    np_ = _round_up(n, bn)
    if np_ != n:
        b = jnp.pad(b, ((0, 0), (0, np_ - n)))

    grid = (batch, mb, np_ // bn, n_ell)

    # The scalar-prefetch operand lives in SMEM, where trailing dims are
    # tile-padded (..., 8, 128); keep it 1-D so a [batch, mb, ell] index
    # table costs batch*mb*ell*4 bytes, not batch*pad8(mb)*128*4.
    def _val_idx(bi, i, j, kk, col):
        return (bi, i, kk)

    def _b_idx(bi, i, j, kk, col):
        return (col[(bi * mb + i) * n_ell + kk], j)

    def _out_idx(bi, i, j, kk, col):
        return (bi, i, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, bs), _val_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, bn), _b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, bn), _out_idx, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((bs, bn), jnp.float32)],
    )

    flops = 2 * batch * m * ellk * n
    bytes_accessed = (
        values.size * values.dtype.itemsize
        + b.size * b.dtype.itemsize
        + batch * m * n * jnp.dtype(out_dtype).itemsize
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n_ell=n_ell),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, m, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "parallel",
                "arbitrary",
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(col_indices.astype(jnp.int32).reshape(-1), values, b)
    return out[..., :n]
