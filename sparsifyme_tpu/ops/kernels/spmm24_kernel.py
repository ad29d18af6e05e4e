"""Pallas MXU kernel: 2:4 compressed A  x  dense B.

The device-side core of the spmma pipeline's matmul phase
(`cusparseLtMatmul`, reference `include/sparsify.me/spmma.hxx:112-113`),
designed TPU-first rather than translated:

* A arrives compressed as two bf16 value planes plus a uint8 codes plane,
  stored **k-major and batch-folded**: ``v0/v1/codes [K4, M]`` with
  ``K4 = K/4`` groups in sublanes and ``M = prod(batch) * m`` logical
  rows in lanes. HBM traffic for A is ``(2+2+1)/8 = 0.625`` B per
  logical element vs 2 B dense — the bandwidth win that replaces
  Ampere's FLOP win. Two layout choices are load-bearing:
    - k-major puts the group axis in the *sublane* dimension (padding
      quantum 16/32), so small-k layers pad k like a dense matmul
      instead of the 512-element quantum a ``[M, K4]`` lane-major
      layout forces;
    - batch-folding exploits the reference's shared-B convention
      (`gemm.cu:40-41`, `spmm.hxx:67`): one fat matmul instead of
      ``batch`` thin ones — B tiles are DMA'd once per (n, k) tile
      instead of once per batch element, and small-m layers (m=196)
      still fill 512-lane MXU tiles.
* Each grid step runs a statically-unrolled per-quarter
  decompress-and-contract: quarter q's A^T slice is a *compact-domain*
  select (``where(i0==q, v0, 0) + where(i1==q, v1, 0)`` on the
  [block_k4, block_m] planes — ~5 VPU ops per logical element, no
  sublane repeats, no expanded-domain index math), feeding its own MXU
  ``lax.dot_general`` with the *lhs contracting on dim 0* (A^T
  orientation — the systolic array's natural weight-stationary feed)
  against the matching B slab; f32 VMEM accumulator; grid
  (m, n, k) with k innermost ("arbitrary") for accumulation.
* B's rows are pre-permuted once by the caller into the same strided
  quarter-major order (within each k-tile, logical row ``4g+q`` moves to
  ``q*block_k4 + g``), so the contraction is unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def default_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (the
    sanitizer story, SURVEY.md section 5)."""
    return jax.default_backend() != "tpu"


def _kernel(v0_ref, v1_ref, codes_ref, b_ref, out_ref, acc_ref, *, n_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk4, bm = v0_ref.shape

    codes = codes_ref[...].astype(jnp.int32)
    i0 = codes >> 2
    i1 = codes & 3
    v0 = v0_ref[...]
    v1 = v1_ref[...]
    zero = jnp.zeros((), v0.dtype)

    # Per-quarter decompress-and-contract, statically unrolled: quarter
    # q's slice of A^T is a compact-domain select (no sublane repeats,
    # no expanded-domain index arithmetic). Each quarter feeds its own
    # MXU contraction against the matching pre-permuted B slab; the four
    # partial products accumulate in f32 VMEM. v0 never lives in
    # quarter 3 and v1 never in quarter 0 (codes have i0 < i1), so those
    # selects are skipped.
    acc = acc_ref[...]
    for q in range(4):
        if q == 0:
            aq = jnp.where(i0 == q, v0, zero)
        elif q == 3:
            aq = jnp.where(i1 == q, v1, zero)
        else:
            aq = jnp.where(i0 == q, v0, zero) + jnp.where(i1 == q, v1, zero)
        acc = acc + jax.lax.dot_general(
            aq,
            b_ref[q * bk4:(q + 1) * bk4, :],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[...] = acc

    @pl.when(k_idx == n_k - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_logical",
        "out_dtype",
        "block_m",
        "block_n",
        "block_k4",
        "interpret",
    ),
)
def spmm24_pallas(
    v0: jax.Array,
    v1: jax.Array,
    codes: jax.Array,
    b: jax.Array,
    *,
    k_logical: int,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k4: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """``C[M, N] = decompress24(v0, v1, codes)[:, :k_logical] @ b``.

    ``v0/v1/codes``: k-major batch-folded planes ``[K4, M]``; ``b``:
    ``[K, N]`` shared across all folded rows (reference shared-B
    convention, `spmm.hxx:67`).
    """
    if interpret is None:
        interpret = default_interpret()
    k4, m = v0.shape
    k_pad_in = b.shape[0]  # K as stored = 4 * k4 may exceed k_logical
    n = b.shape[1]
    if k_logical > 4 * k4:
        raise ValueError(f"k_logical {k_logical} > 4*k4 {4 * k4}")

    # --- tile selection ---------------------------------------------------
    # k4 sits in the sublane dim (quantum 16 for bf16). m in lanes:
    # quantum 128. Pick bk4 to minimize k4 padding — every padded group
    # is wasted traffic AND wasted MXU depth (ResNet k4s are multiples
    # of 16 except the stem's 37, so most shapes pad zero).
    bm = block_m or min(_round_up(m, 128), 512)
    bn = block_n or min(_round_up(n, 128), 512)
    if block_k4:
        bk4 = block_k4
    elif k4 <= 128:
        bk4 = _round_up(k4, 16)
    else:
        bk4 = min(
            range(16, 129, 16),
            key=lambda c: (_round_up(k4, c), -c),
        )

    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    k4p = _round_up(k4, bk4)
    kp = 4 * k4p

    # --- padding ----------------------------------------------------------
    if mp != m or k4p != k4:
        pad_m, pad_k4 = mp - m, k4p - k4
        v0 = jnp.pad(v0, ((0, pad_k4), (0, pad_m)))
        v1 = jnp.pad(v1, ((0, pad_k4), (0, pad_m)))
        # code 1 == (i0=0, i1=1): a valid code; padded values are zero.
        codes = jnp.pad(codes, ((0, pad_k4), (0, pad_m)), constant_values=1)
    if kp != k_pad_in or np_ != n:
        b = jnp.pad(b, ((0, kp - k_pad_in), (0, np_ - n)))

    n_k = k4p // bk4
    grid = (mp // bm, np_ // bn, n_k)

    # Permute B rows into the kernel's quarter-major tile order: within
    # each k-tile of 4*bk4 rows, logical row 4g+q moves to q*bk4+g.
    b = (
        b.reshape(n_k, bk4, 4, np_)
        .swapaxes(1, 2)
        .reshape(kp, np_)
    )

    flops = 2 * m * k_logical * n
    bytes_accessed = (
        v0.size * v0.dtype.itemsize * 2
        + codes.size
        + b.size * b.dtype.itemsize
        + m * n * jnp.dtype(out_dtype).itemsize
    )

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bk4, bm),
                lambda i, j, kk: (kk, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk4, bm),
                lambda i, j, kk: (kk, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk4, bm),
                lambda i, j, kk: (kk, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4 * bk4, bn),
                lambda i, j, kk: (kk, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn),
            lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(v0, v1, codes, b)
    return out[:m, :n]
