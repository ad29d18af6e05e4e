"""Pallas MXU kernel: 2:4 compressed A  x  dense B.

The device-side core of the spmma pipeline's matmul phase
(`cusparseLtMatmul`, reference `include/sparsify.me/spmma.hxx:112-113`),
designed TPU-first rather than translated:

* A arrives compressed as two bf16 value planes ``v0/v1 [M, K4]`` plus a
  uint8 ``codes [M, K4]`` plane (``K4 = K/4`` groups). HBM traffic for A is
  ``(2+2+1)/8 = 0.625`` B/logical-element vs 2 B dense — the bandwidth win
  that replaces Ampere's FLOP win.
* Each grid step decompresses one (block_m, 4*block_k4) tile of A in VMEM
  using only lane-aligned VPU ops: ``pltpu.repeat(x, 4, axis=1)`` aligns
  the per-group values/indices with the dense lanes, and a lane iota ``% 4``
  selects positions. No gathers, no lane-splitting reshapes, so Mosaic
  keeps everything in native layout.
* The dense tile feeds ``jnp.dot`` (MXU) with an f32 VMEM accumulator;
  the grid is (m, n, k) with k innermost ("arbitrary") for accumulation.
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

    bm, bk4 = v0_ref.shape
    bk = 4 * bk4

    codes = codes_ref[:].astype(jnp.int32)
    i0 = codes >> 2
    i1 = codes & 3

    # ``pltpu.repeat`` tiles whole copies along lanes ([x | x | x | x]), so
    # we build the dense A tile in a *strided* column layout: group g's
    # in-group position q lands at lane q*bk4 + g. This costs zero lane
    # shuffles — the per-lane group data is just a tiled broadcast and the
    # in-group position is a blockwise-constant iota. B's rows are
    # pre-permuted to the same layout by the caller (a one-time transpose
    # amortized over the whole grid), so the contraction is unchanged.
    v0 = pltpu.repeat(v0_ref[:], 4, axis=1)  # [bm, bk]
    v1 = pltpu.repeat(v1_ref[:], 4, axis=1)
    i0 = pltpu.repeat(i0, 4, axis=1)
    i1 = pltpu.repeat(i1, 4, axis=1)
    q = jax.lax.broadcasted_iota(jnp.int32, (bm, bk), 1) // bk4

    zero = jnp.zeros((), v0.dtype)
    a = jnp.where(i0 == q, v0, zero) + jnp.where(i1 == q, v1, zero)

    acc_ref[:] += jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k_idx == n_k - 1)
    def _store():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


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
    """C[M, N] = decompress24(v0, v1, codes)[M, :k_logical] @ b[K, N]."""
    if interpret is None:
        interpret = default_interpret()
    m, k4 = v0.shape
    k_pad_in = b.shape[0]  # K as stored = 4 * k4 may exceed k_logical
    n = b.shape[1]
    if k_logical > 4 * k4:
        raise ValueError(f"k_logical {k_logical} > 4*k4 {4 * k4}")

    # --- tile selection ---------------------------------------------------
    bm = block_m or min(_round_up(m, 16), 256)
    bn = block_n or min(_round_up(n, 128), 512)
    bk4 = block_k4 or min(_round_up(k4, 128), 256)

    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    k4p = _round_up(k4, bk4)
    kp = 4 * k4p

    # --- padding ----------------------------------------------------------
    if mp != m or k4p != k4:
        pad_m, pad_k4 = mp - m, k4p - k4
        v0 = jnp.pad(v0, ((0, pad_m), (0, pad_k4)))
        v1 = jnp.pad(v1, ((0, pad_m), (0, pad_k4)))
        # code 1 == (i0=0, i1=1): a valid code; padded values are zero.
        codes = jnp.pad(codes, ((0, pad_m), (0, pad_k4)), constant_values=1)
    if kp != k_pad_in or np_ != n:
        b = jnp.pad(b, ((0, kp - k_pad_in), (0, np_ - n)))

    n_k = k4p // bk4
    grid = (mp // bm, np_ // bn, n_k)

    # Permute B rows into the kernel's strided tile layout: within each
    # k-tile, original row 4g+q moves to position q*bk4+g.
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
                (bm, bk4), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bm, bk4), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bm, bk4), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4 * bk4, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
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
