"""Pruning ops: block-structured, 2:4, and threshold magnitude pruning.

TPU-native equivalent of the reference's prune surface:

* `sparsifyme::sparsify<BLK_M, BLK_N>` (`include/sparsify.me/sparsify.hxx:24-82`)
  zeroes ``floor(blk_size * sparsity_factor)`` elements per BLK_M x BLK_N
  block and emits a 0/1 mask. The reference's selection policy is positional
  (its `<todo>` at `sparsify.hxx:58-59` admits magnitude selection is
  unimplemented); we implement the *intended* capability — magnitude top-k
  per block — behind the same (block shape, sparsity factor, mask out) API.

* the cusparseLt prune phase (`cusparseLtSpMMAPrune` with TILE alg +
  `PruneCheck`, `include/sparsify.me/spmma.hxx:85-94`) becomes
  :func:`prune_24` / :func:`prune_check_24`.

All ops are pure, jittable, and batch via leading dims (the reference's
OpenMP-over-streams batching, `spmm.hxx:94`, becomes plain vectorization).
Masks are the operand dtype's 0/1 (not the reference's 8-byte `std::size_t`
mask, `sparsify.hxx:26` — a quirk, not a capability).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pad_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _keep_topn_mask(a_abs: jax.Array, n: int) -> jax.Array:
    """Boolean mask keeping the ``n`` largest of the (small) last axis.

    Comparison-based ranking (O(m^2) elementwise compares, fully fused by
    XLA) instead of argsort — TPU sort lowerings allocate enormous
    temporaries at batched-conv scale. Total order: magnitude, then
    position (later positions win ties), matching a stable ascending
    argsort's rank semantics.
    """
    m = a_abs.shape[-1]
    ai = a_abs[..., :, None]
    aj = a_abs[..., None, :]
    pos = jnp.arange(m, dtype=jnp.int32)
    less = (ai < aj) | ((ai == aj) & (pos[:, None] < pos[None, :]))
    ranks = jnp.sum(less.astype(jnp.int32), axis=-2)  # rank of each j
    return ranks >= (m - n)


@functools.partial(jax.jit, static_argnames=("block", "sparsity"))
def prune_block_magnitude(
    w: jax.Array,
    block: Tuple[int, int] = (2, 2),
    sparsity: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """Magnitude prune per (BLK_M, BLK_N) block; returns (pruned, mask).

    Zeroes the ``floor(blk_m * blk_n * sparsity)`` smallest-magnitude
    elements of every block (`sparsify.hxx:41` drop-count semantics, with
    the magnitude policy the reference left as `<todo>`). Ties are broken
    by position (earlier elements survive).

    Batches over leading dims; the last two dims are the matrix. Dims must
    be divisible by the block shape (mirroring the reference's implicit
    assumption, `sparsify.hxx:30-33`).
    """
    bm, bn = block
    *lead, m, n = w.shape
    if m % bm or n % bn:
        raise ValueError(f"matrix {m}x{n} not divisible by block {block}")
    bs = bm * bn
    drop = int(bs * sparsity)
    if drop <= 0:
        return w, jnp.ones_like(w)
    mb, nb = m // bm, n // bn
    blocks = w.reshape(*lead, mb, bm, nb, bn)
    blocks = jnp.moveaxis(blocks, -3, -2)  # (..., mb, nb, bm, bn)
    flat = blocks.reshape(*lead, mb, nb, bs)
    keep = _keep_topn_mask(jnp.abs(flat), bs - drop)
    mask = keep.reshape(*lead, mb, nb, bm, bn)
    mask = jnp.moveaxis(mask, -2, -3).reshape(*lead, m, n)
    mask = mask.astype(w.dtype)
    return w * mask, mask


@functools.partial(jax.jit, static_argnames=("n", "m"))
def prune_nm(w: jax.Array, n: int = 2, m: int = 4) -> Tuple[jax.Array, jax.Array]:
    """N:M magnitude prune along the last axis; returns (pruned, mask).

    Keeps the ``n`` largest-magnitude elements of every contiguous group of
    ``m`` along the contraction axis. ``prune_nm(w, 2, 4)`` is the 2:4
    structured pattern consumed by the spmma pipeline
    (`CUSPARSELT_SPARSITY_50_PERCENT`, `spmma.hxx:56-58`).

    Layout-preserving by design: ranking is computed with ``m - 1``
    lane-rolls plus elementwise compares in the original ``(..., k)``
    layout. (Reshaping groups into a trailing length-``m`` axis — the
    obvious formulation — gives the array a 4-element lane dimension,
    which TPU pads to 128 lanes: a 32x relayout tax that made this op
    run at ~1/10th of HBM bandwidth.)

    The last axis is zero-padded to a multiple of ``m`` internally; padding
    never displaces real values (pads have magnitude 0 and lose magnitude
    ties to real elements by position only when values are exactly 0, in
    which case the choice is value-equivalent).

    Tie-break: equal magnitudes rank by position, later positions win —
    identical to a stable ascending argsort's rank order.
    """
    from .kernels.prune_kernel import prune_nm_pallas

    if jax.default_backend() == "tpu":
        # Pallas kernel: group shuffles stay in registers (the XLA
        # roll formulation materializes concat+slice intermediates).
        return prune_nm_pallas(w, n, m)
    *lead, k = w.shape
    wp = _pad_to_multiple(w, -1, m)
    kp = wp.shape[-1]
    a = jnp.abs(wp)
    # In-group position of every lane: 0..m-1 repeating.
    pos = jax.lax.broadcasted_iota(jnp.int32, wp.shape, wp.ndim - 1) % m
    # beat-count: how many group members outrank this element.
    cnt = jnp.zeros(wp.shape, jnp.int32)
    for s in range(1, m):
        # Partner at in-group index (pos + s) % m: a lane-roll of -s for
        # members ahead of us, +(m - s) for the wrap-around (both rolls
        # are concat+slice on the lane axis — cheap, fusible).
        fwd = jnp.roll(a, -s, axis=-1)
        bwd = jnp.roll(a, m - s, axis=-1)
        wraps = pos + s >= m
        partner = jnp.where(wraps, bwd, fwd)
        ppos = jnp.where(wraps, pos + s - m, pos + s)
        beats = (partner > a) | ((partner == a) & (ppos > pos))
        cnt = cnt + beats.astype(jnp.int32)
    mask = (cnt < n).astype(w.dtype)[..., :k]
    return w * mask, mask


def prune_24(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2:4 magnitude prune along the last axis (prune phase of the spmma
    pipeline, `spmma.hxx:85-88`)."""
    return prune_nm(w, 2, 4)


@functools.partial(jax.jit, static_argnames=("threshold",))
def prune_threshold(
    w: jax.Array, threshold: float
) -> Tuple[jax.Array, jax.Array]:
    """Unstructured magnitude-threshold prune: zero |w| < threshold.

    Capability from BASELINE configs[0] ("magnitude-threshold prune") —
    the unstructured-sparsity entry point feeding the COO path.
    """
    mask = (jnp.abs(w) >= threshold).astype(w.dtype)
    return w * mask, mask


@functools.partial(jax.jit, static_argnames=("n", "m"))
def prune_check_nm(w: jax.Array, n: int = 2, m: int = 4) -> jax.Array:
    """Structural validity check: every m-group has <= n nonzeros.

    The `cusparseLtSpMMAPruneCheck` analog (`spmma.hxx:88-94`,
    `cusparseLt.h:310-321`) — usable both as a runtime op and in tests.
    Returns a scalar bool.
    """
    *lead, k = w.shape
    wp = _pad_to_multiple(w, -1, m)
    groups = wp.reshape(*lead, wp.shape[-1] // m, m)
    nnz_per_group = jnp.sum((groups != 0).astype(jnp.int32), axis=-1)
    return jnp.all(nnz_per_group <= n)


def prune_check_24(w: jax.Array) -> jax.Array:
    return prune_check_nm(w, 2, 4)


@functools.partial(jax.jit, static_argnames=("block_size", "ell_blocks",
                                              "block_k"))
def prune_block_topk(
    w: jax.Array, block_size: int, ell_blocks: int,
    block_k: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Keep the top-``ell_blocks`` blocks (by L2 norm) per block-row.

    The pruning policy that produces Blocked-ELL structure: for each
    block-row of ``block_size`` x ``block_k`` blocks (``block_k=0`` means
    square), keep the ``ell_blocks`` blocks with the largest Frobenius
    norm and zero the rest. Returns ``(pruned, block_col_indices)`` where
    ``block_col_indices`` is ``(..., m_blocks, ell_blocks)`` int32,
    **sorted ascending** per block-row (the reference driver builds
    sorted, deduped block columns, `examples/spmm.cu:63-84`).
    """
    *lead, mm, kk = w.shape
    bk_blk = block_k or block_size
    if mm % block_size or kk % bk_blk:
        raise ValueError(
            f"{mm}x{kk} not divisible by block {block_size}x{bk_blk}"
        )
    mb, kb = mm // block_size, kk // bk_blk
    if ell_blocks > kb:
        raise ValueError(f"ell_blocks {ell_blocks} > k_blocks {kb}")
    blocks = w.reshape(*lead, mb, block_size, kb, bk_blk)
    norms = jnp.sum(
        jnp.square(blocks.astype(jnp.float32)), axis=(-3, -1)
    )  # (..., mb, kb)
    _, top_idx = jax.lax.top_k(norms, ell_blocks)  # (..., mb, ell_blocks)
    col_indices = jnp.sort(top_idx, axis=-1).astype(jnp.int32)
    # (..., mb, ell, kb) one-hot over block-columns, OR'd across kept slots.
    onehot = col_indices[..., None] == jnp.arange(kb, dtype=jnp.int32)
    keep_blocks = jnp.any(onehot, axis=-2)  # (..., mb, kb)
    mask = keep_blocks[..., :, None, :, None].astype(w.dtype)
    pruned = (blocks * mask).reshape(*lead, mm, kk)
    return pruned, col_indices
