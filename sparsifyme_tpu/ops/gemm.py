"""Batched dense GEMM baselines.

TPU-native equivalent of the reference's cuBLAS baselines
(`include/sparsify.me/gemm.hxx:25-195`: `cublasHgemmBatched` /
`cublasSgemmBatched` / `cublasDgemmBatched` behind one `batched::gemm`
template). On TPU the "vendor BLAS" is XLA's MXU matmul emitter, so the
baseline is a jitted `lax.dot_general` with explicit accumulation dtype —
this is the number every sparse kernel must beat.

Dtype specializations: bf16 (the `__half` analog), f32, and f64 (CPU only —
TPUs have no f64 MXU path; the op still works for the fp64 capability via
the XLA CPU backend). The alpha/beta epilogue of the cuBLAS API
(`gemm.hxx:33-35`) is kept.

The shared-B convention of the reference drivers (one B broadcast across
the batch via duplicated pointers, `examples/gemm.cu:40-41,83-86`) maps to
broadcasting a rank-2 ``b`` against a rank-3 ``a``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=("transpose_a", "transpose_b", "out_dtype", "fold"),
)
def batched_gemm(
    a: jax.Array,
    b: jax.Array,
    *,
    transpose_a: bool = False,
    transpose_b: bool = False,
    alpha: float = 1.0,
    beta: float = 0.0,
    c: Optional[jax.Array] = None,
    out_dtype=None,
    fold: bool = True,
) -> jax.Array:
    """``C = alpha * op(A) @ op(B) + beta * C`` over leading batch dims.

    ``a``: ``(..., m, k)``; ``b``: ``(k, n)`` shared or ``(..., k, n)``
    per-batch. Accumulation is always f32 on the MXU
    (``preferred_element_type``), mirroring the fp16-storage/fp32-compute
    convention of the reference SpMM path (`spmm.hxx:60,82`).
    """
    if transpose_a:
        a = jnp.swapaxes(a, -1, -2)
    if transpose_b:
        b = jnp.swapaxes(b, -1, -2)
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    if fold and b.ndim == 2 and a.ndim > 2:
        # Shared-B batches fold into one fat matmul (free reshapes):
        # batch-of-thin matmuls underfill the MXU and refetch B per
        # batch element. XLA's batched path occasionally wins on
        # tall-skinny products, so ``fold=False`` keeps it reachable
        # (the bench takes the best of both as the dense baseline).
        lead = a.shape[:-2]
        out = jnp.matmul(
            a.reshape(-1, a.shape[-1]), b,
            preferred_element_type=jnp.float32,
        ).reshape(*lead, a.shape[-2], b.shape[-1])
    else:
        out = jnp.matmul(a, b, preferred_element_type=jnp.float32)
    out = alpha * out
    if c is not None:
        out = out + beta * c.astype(out.dtype)
    return out.astype(out_dtype)


def gemm_bf16(a, b, **kw):
    """bf16-storage baseline (the `cublasHgemmBatched` analog)."""
    return batched_gemm(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        out_dtype=jnp.bfloat16, **kw
    )


def gemm_f32(a, b, **kw):
    """f32 baseline (the `cublasSgemmBatched` analog)."""
    return batched_gemm(
        a.astype(jnp.float32), b.astype(jnp.float32),
        out_dtype=jnp.float32, **kw
    )


def gemm_f64(a, b, **kw):
    """f64 baseline (the `cublasDgemmBatched` analog; CPU backend only —
    enable with ``jax.config.update('jax_enable_x64', True)``)."""
    return batched_gemm(
        a.astype(jnp.float64), b.astype(jnp.float64),
        out_dtype=jnp.float64, **kw
    )
