"""2:4-sparse convolution via im2col + the Pallas SpMM kernel.

The reference never *runs* a conv — it derives im2col GEMM shapes from
torchvision convs (`datasets/get_shapes.py:22-42`) and benchmarks the
matmuls. This module closes the loop TPU-natively: a conv layer whose
weight is stored 2:4-compressed and whose forward pass IS the benchmarked
sparse matmul, so the shape-sweep numbers translate directly into model
latency.

im2col mapping (identical to the reference's accounting,
`get_shapes.py:27-41`): filters ``(out_ch, in_ch, kh, kw)`` reshape to
``(out_ch, in_ch*kh*kw)`` = the sparse A ``(n, k)``; input patches unfold
to ``(batch*oh*ow, in_ch*kh*kw)`` = the dense operand; the product
``(batch*oh*ow, out_ch)`` folds back to ``(batch, oh, ow, out_ch)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..containers import Sparse24
from ..ops.prune import prune_nm
from ..ops.sparse24 import compress_24, spmm_24


def im2col(
    x: jax.Array,
    kh: int,
    kw: int,
    stride: int = 1,
    padding: str = "SAME",
) -> jax.Array:
    """Unfold NHWC input into patches ``(batch, oh, ow, in_ch*kh*kw)``.

    Uses XLA's native patch extraction, which the TPU backend lowers to
    efficient loads (not a Python loop over taps). Patch features are
    ordered ``(in_ch, kh, kw)`` (verified empirically) — exactly the
    order of the reference's OIHW weight flatten
    ``(out_ch, in_ch*kh*kw)`` (`get_shapes.py:30-33`), so
    :func:`conv_weight_as_matrix` pairs with this directly.
    """
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv_general_dilated_patches emits features ordered (in_ch, kh, kw)
    # for NHWC; callers pair it with weights flattened the same way.
    return patches


def conv_weight_as_matrix(w_oihw: jax.Array) -> jax.Array:
    """Reference weight layout ``(out_ch, in_ch, kh, kw)`` ->
    ``(out_ch, in_ch*kh*kw)`` matching :func:`im2col` feature order
    (`get_shapes.py:30-33` does the same reshape)."""
    oc, ic, kh, kw = w_oihw.shape
    return w_oihw.reshape(oc, ic * kh * kw)


class SparseConv2d:
    """Conv layer with a 2:4-compressed weight; forward = sparse matmul.

    The weight matrix ``(out_ch, k)`` (k = in_ch*kh*kw) is pruned 2:4
    along k (the contraction axis — exactly the axis cusparseLt requires,
    `spmma.hxx:56-58`) and stored compressed. The forward pass computes
    ``spmm_24(W24, patches^T)^T``: the compressed operand feeds the MXU
    kernel as the stationary matrix, patches stream through.
    """

    def __init__(
        self,
        w_oihw: jax.Array,
        stride: int = 1,
        padding: str = "SAME",
    ):
        oc, ic, kh, kw = w_oihw.shape
        self.kh, self.kw, self.stride, self.padding = kh, kw, stride, padding
        self.out_ch, self.in_ch = oc, ic
        wm = conv_weight_as_matrix(w_oihw)
        pruned, _ = prune_nm(wm, 2, 4)
        self.weight = compress_24(pruned)

    def __call__(self, x: jax.Array) -> jax.Array:
        """NHWC in -> NHWC out."""
        b, h, w, _ = x.shape
        patches = im2col(x, self.kh, self.kw, self.stride, self.padding)
        _, oh, ow, k = patches.shape
        pt = patches.reshape(b * oh * ow, k)
        # W24 (out_ch, k) x patches^T (k, b*oh*ow) -> (out_ch, b*oh*ow):
        # transpose_out returns the (b*oh*ow, out_ch)-major result
        # directly (C^T of C=W@P^T), no extra transpose pass.
        out = spmm_24(self.weight, pt.T, transpose_out=True)
        return out.reshape(b, oh, ow, self.out_ch)

    def dense_reference(self, x: jax.Array) -> jax.Array:
        """Oracle: the same conv with the pruned weight, dense XLA conv."""
        from ..ops.sparse24 import decompress_24

        wm = decompress_24(self.weight)
        w_oihw = wm.reshape(self.out_ch, self.in_ch, self.kh, self.kw)
        # OIHW -> HWIO for NHWC conv.
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, w_hwio,
            window_strides=(self.stride, self.stride),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class EllConv2d:
    """Conv layer with a Blocked-ELL weight; forward = the blocked-ELL
    gather SpMM — the library's WINNING sparse format (compare.csv's
    `spmm` column is the reference's blocked-ELL path) as a model layer.

    The weight matrix ``(out_ch, k)`` keeps the top ``ell_blocks``
    magnitude blocks per block-row (`ops.ell.ell_from_dense`); the
    forward computes ``spmm_ell(W_ell, patches^T, transpose_out=True)``
    so the result lands patch-major without an extra transpose.
    Differentiable end-to-end since round 5 (`ops.ell._spmm_ell_core`'s
    custom VJP): train with `jax.grad` over ``weight.values``.
    """

    def __init__(
        self,
        w_oihw: jax.Array,
        *,
        block_size: int = 128,
        ell_blocks: Optional[int] = None,
        block_k: int = 0,
        stride: int = 1,
        padding: str = "SAME",
    ):
        from ..ops.ell import ell_from_dense

        oc, ic, kh, kw = w_oihw.shape
        self.kh, self.kw, self.stride, self.padding = (kh, kw, stride,
                                                       padding)
        self.out_ch, self.in_ch = oc, ic
        wm = conv_weight_as_matrix(w_oihw)
        k = wm.shape[-1]
        bkb = block_k or block_size
        if oc % block_size:
            raise ValueError(
                f"out_ch {oc} must be a multiple of block_size "
                f"{block_size}")
        kp = -(-k // bkb) * bkb
        if kp != k:
            wm = jnp.pad(wm, ((0, 0), (0, kp - k)))
        if ell_blocks is None:
            ell_blocks = max(1, (kp // bkb) // 2)  # 50% block sparsity
        self.k_padded = kp
        self.weight = ell_from_dense(wm, block_size=block_size,
                                     ell_blocks=ell_blocks,
                                     block_k=block_k)

    def __call__(self, x: jax.Array) -> jax.Array:
        """NHWC in -> NHWC out."""
        from ..ops.ell import spmm_ell

        b, h, w, _ = x.shape
        patches = im2col(x, self.kh, self.kw, self.stride, self.padding)
        _, oh, ow, k = patches.shape
        pt = patches.reshape(b * oh * ow, k)
        if k != self.k_padded:
            pt = jnp.pad(pt, ((0, 0), (0, self.k_padded - k)))
        out = spmm_ell(self.weight, pt.T, transpose_out=True)
        return out.reshape(b, oh, ow, self.out_ch)

    def dense_reference(self, x: jax.Array) -> jax.Array:
        """Oracle: the same conv with the block-pruned weight, dense."""
        from ..ops.ell import ell_to_dense

        wm = ell_to_dense(self.weight)[:, : self.in_ch * self.kh * self.kw]
        w_oihw = wm.reshape(self.out_ch, self.in_ch, self.kh, self.kw)
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
        return jax.lax.conv_general_dilated(
            x, w_hwio,
            window_strides=(self.stride, self.stride),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
