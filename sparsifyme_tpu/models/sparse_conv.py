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
