"""Sparse matrix containers as JAX pytrees.

TPU-native equivalents of the reference's containers layer
(`include/sparsify.me/containers/ell.hxx:21-68`, `containers/vector.hxx`,
`containers/memory.hxx`). On TPU there is no host/device vector split —
arrays are `jax.Array`s placed by shardings — so `vector_t`/`memory_space_t`
collapse into plain arrays, and the containers here carry the *format*
metadata the kernels consume.

Formats:

* :class:`Sparse24` — 2:4 structured sparsity along the last (contraction)
  axis: for every contiguous group of 4 elements, exactly 2 are kept. The
  capability contract of the reference's cusparseLt pipeline
  (`include/sparsify.me/spmma.hxx:21-118`), stored TPU-natively as two
  value planes plus a packed index code per group (lane-aligned layouts the
  Pallas kernel can expand with pure VPU ops — no gathers).

* :class:`BlockedEll` — Blocked-ELL: a fixed number of dense blocks per
  block-row, each tagged with its block-column. The `ell_t` analog
  (`containers/ell.hxx:23-33`), with block sizes chosen for the MXU
  (>= 8, typically 128) instead of the reference's 2x2.

* :class:`Coo` — coordinate format for the strided-batched COO SpMM
  capability (`include/sparsify.me/spmm.hxx:140-193`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def _register(cls):
    """Register a dataclass as a pytree (array fields = leaves)."""
    data_fields = [
        f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")
    ]
    meta_fields = [
        f.name for f in dataclasses.fields(cls) if f.metadata.get("static")
    ]
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static_field(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


@_register
@dataclasses.dataclass(frozen=True)
class Sparse24:
    """2:4-compressed matrix, sparse along the last axis.

    For logical shape ``(..., m, k)`` (k padded to a multiple of 4 before
    compression), groups are ``k4 = k // 4`` contiguous runs of 4.

    Planes are stored **k-major and batch-folded**: always 2-D
    ``[k4, M]`` with ``M = prod(batch_dims) * m`` (batch-major fold).
    k-major puts ``k4`` in the sublane dim (quantum 16/32) — a
    lane-major ``(m, k4)`` layout would give small-k layers a
    4*128 = 512-element effective-k quantum. Batch-folding exploits the
    shared-B convention: the kernel sees one fat matmul instead of
    ``batch`` thin ones (B tiles fetched once, MXU tiles full even for
    m=196 layers). The Pallas kernel consumes this layout directly.

    Fields:
      values0: ``[k4, M]`` — first kept value of each group (lower idx).
      values1: ``[k4, M]`` — second kept value (higher idx).
      codes:   ``[k4, M]`` uint8 — packed indices ``i0 * 4 + i1`` with
               ``0 <= i0 < i1 < 4`` (6 valid codes). 0.25 B per logical
               element vs 2 B for dense bf16.
      shape:   the logical (unpadded) dense shape, incl. batch dims.
      fold:    row-fold factor of the plane layout (static). ``fold=f``
               means planes are ``[f*k4, M/f]``: plane row ``h*k4 + g``
               of folded column ``j`` holds group ``g`` of original row
               ``f*j + h`` — the layout the fused prune+compress kernel
               emits for narrow-k layers (full-vreg ranking on the free
               ``[rows, k] -> [rows/f, f*k]`` reshape) and the folded
               SpMM kernel consumes directly, so no un-interleave
               transpose is ever paid. ``fold=1`` is the standard
               layout.
    """

    values0: jax.Array
    values1: jax.Array
    codes: jax.Array
    shape: Tuple[int, ...] = static_field(default=())
    fold: int = static_field(default=1)

    @property
    def dtype(self):
        return self.values0.dtype

    @property
    def k4(self) -> int:
        return self.values0.shape[-2] // self.fold

    @property
    def nnz(self) -> int:
        import numpy as np

        return int(np.prod(self.values0.shape)) * 2

    def nbytes(self) -> int:
        return (
            self.values0.size * self.values0.dtype.itemsize
            + self.values1.size * self.values1.dtype.itemsize
            + self.codes.size
        )


@_register
@dataclasses.dataclass(frozen=True)
class BlockedEll:
    """Blocked-ELL matrix: ``ell_blocks`` kept dense blocks per block-row.

    Logical dense shape ``(..., m, k)`` with ``block_size x block_k``
    blocks (the reference's `ell_t` is square, `containers/ell.hxx:23-33`;
    rectangular blocks are this library's extension — rows stay MXU-wide
    at 128 while the k-edge shrinks so small-k layers still get real
    block sparsity); ``m_blocks = m / block_size`` block-rows each keep
    ``ell_blocks`` blocks.

    Fields:
      values:      ``(..., m, ell_blocks * block_k)`` — kept blocks packed
                   contiguously along the column axis (row-major within a
                   block-row), i.e. the reference's `ell_t.values`
                   (`containers/ell.hxx:31-33`) laid out 2-D for the MXU.
      col_indices: ``(..., m_blocks, ell_blocks)`` int32 — block-column of
                   each kept block (`ell_t.column_indices`), in units of
                   ``block_k``-wide column blocks.
      shape:       logical dense shape.
      block_size:  static block row-edge (MXU-friendly: >= 8).
      block_k:     static block column-edge; 0 means square
                   (= block_size).
    """

    values: jax.Array
    col_indices: jax.Array
    shape: Tuple[int, ...] = static_field(default=())
    block_size: int = static_field(default=128)
    block_k: int = static_field(default=0)

    @property
    def bk(self) -> int:
        """Effective block column-edge."""
        return self.block_k or self.block_size

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def ell_blocks(self) -> int:
        return self.col_indices.shape[-1]

    @property
    def m_blocks(self) -> int:
        return self.col_indices.shape[-2]

    @property
    def k_blocks(self) -> int:
        return self.shape[-1] // self.bk

    @property
    def nnz(self) -> int:
        return self.values.size

    def nbytes(self) -> int:
        return (
            self.values.size * self.values.dtype.itemsize
            + self.col_indices.size * self.col_indices.dtype.itemsize
        )


@_register
@dataclasses.dataclass(frozen=True)
class Coo:
    """COO sparse matrix (single instance; batching broadcasts it).

    Fields:
      rows, cols: ``(nnz,)`` int32 coordinate arrays.
      values:     ``(nnz,)``.
      shape:      logical dense shape ``(m, k)``.

    The strided-batch semantics of the reference
    (`cusparseCooSetStridedBatch(matA, num_batches, 0)`,
    `spmm.hxx:169`) — one sparse A shared by every batch — are expressed by
    keeping a single Coo and batching only the dense operands.
    """

    rows: jax.Array
    cols: jax.Array
    values: jax.Array
    shape: Tuple[int, ...] = static_field(default=())

    @property
    def nnz(self) -> int:
        return self.values.shape[-1]

    @property
    def dtype(self):
        return self.values.dtype

    def todense(self) -> jax.Array:
        m, k = self.shape
        out = jnp.zeros((m, k), self.values.dtype)
        return out.at[self.rows, self.cols].add(self.values)
