"""Pallas MXU kernel: batched Blocked-ELL SpMM (gather-of-dense-tiles).

The device-side core of the reference's batched Blocked-ELL SpMM
(`cusparseSpMM` on `cusparseCreateBlockedEll` descriptors,
`include/sparsify.me/spmm.hxx:50-115`), designed TPU-first:

* The sparse A is stored as packed dense blocks (values ``[.., m,
  ell_blocks*bs]``) plus per-block-row block-column indices. Unlike the
  reference's 2x2 blocks, block sizes are MXU-scaled (>= 8, typically
  128), so every kept block is a full systolic-array matmul and every
  *skipped* block is real FLOPs saved — the TPU replacement for sparse
  tensor cores.
* **B stays resident in VMEM.** An n-tile of B ([k, bn], up to ~4 MB)
  is DMA'd once per n-tile (the n-tile grid axis is outermost) and the
  irregular block-row gather becomes a cheap dynamic *sublane slice* of
  VMEM — B is never refetched from HBM per block-row, which would
  otherwise multiply B traffic by the number of block-rows.
* Each grid step processes ``mblk`` block-rows: the packed values tile
  ``[mblk*bs, ell*bs]`` is one contiguous DMA, and a static loop over
  its block-rows runs an ell-deep accumulation loop of
  ``[bs, bs] @ [bs, bn]`` MXU matmuls — few, fat grid steps instead of
  one tiny step per (block-row, ell-slot).
* Block-column indices are scalar-prefetched (SMEM) and read inside the
  kernel with dynamic indices — no scalar-core stalls on the irregular
  access pattern.
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


def _pick_mblk(mb: int, cap: int) -> int:
    """Block-rows per grid step under ``cap``.

    Minimize the padded total (``ceil(mb/mblk) * mblk`` — padded
    block-rows run real dots on zero values), then prefer fewer, fatter
    steps. The round-3 rule preferred the cap over a clean divisor
    whenever the best divisor was < 3/4 of it, which padded up to 16%
    of the rows (mb=56, cap=13 -> 65 padded block-rows vs mblk=8's 56);
    on the m=196 layers that waste alone outweighed the per-step fixed
    cost it saved. Cost model: ``padded + 2 * steps`` block-row
    equivalents — a grid step's fixed cost (~0.7 us) is worth about two
    128-row dot groups at typical tile sizes."""
    cap = max(1, min(cap, mb))
    best, best_cost = 1, None
    for mblk in range(1, cap + 1):
        steps = _cdiv(mb, mblk)
        cost = steps * mblk + 2 * steps
        if best_cost is None or cost < best_cost or (
                cost == best_cost and mblk > best):
            best, best_cost = mblk, cost
    return best


def _kernel(col_ref, val_ref, b_ref, out_ref, *, mblk: int, n_ell: int,
            bs: int, bkb: int, mb: int, tout: bool, accum: bool,
            static_gather: bool = False, split_n: int = 1):
    ib = pl.program_id(1)
    bn_k = b_ref.shape[1]
    bnc = bn_k // split_n  # per-sub-dot n width

    def store(res, r, h):
        # Write sub-dot h's [.., bnc] product into its out slice.
        if tout:
            rows = out_ref.shape[0]
            lo = h * bnc
            hi = min((h + 1) * bnc, rows)
            if lo >= rows:
                return
            out_ref[lo:hi, r * bs:(r + 1) * bs] = res[
                :hi - lo].astype(out_ref.dtype)
        else:
            out_ref[r * bs:(r + 1) * bs, h * bnc:(h + 1) * bnc] = (
                res.astype(out_ref.dtype))

    for r in range(mblk):  # static unroll over the tile's block-rows
        row = (ib * mblk + r) * n_ell
        # Gather this block-row's B slabs by SUBLANE dynamic slices
        # (any offset — lane slices would need 128-alignment, which a
        # 32-wide block edge cannot give). ``static_gather`` replaces
        # the data-dependent offsets with static ones — WRONG results,
        # purely a timing probe isolating the dynamic-gather cost
        # (everything else byte-identical).
        slabs = [
            (b_ref[e * bkb:(e + 1) * bkb, :] if static_gather else
             b_ref[pl.ds(col_ref[row + e] * bkb, bkb), :])
            for e in range(n_ell)
        ]
        a_blk = val_ref[r * bs:(r + 1) * bs, :]
        if accum:
            # Per-slab accumulated dots: each gathered slab feeds the
            # MXU directly — no [ellk, bn] concatenate copy. At wide
            # block edges (bkb >= 64) the depth-bkb dots keep the array
            # busy and skipping the materialized copy (2*ellk*bn bytes
            # of VMEM writes+reads per block-row) is a pure win; at
            # bkb = 32 prefer the concat formulation below, whose one
            # deep dot compensates the copy. ``split_n > 1`` further
            # splits each dot along n (round 5): the bn=256 tuner wins
            # on n=512 shapes came with A streamed once per n-tile —
            # sub-dots reproduce that dot geometry under a single
            # full-width n-tile, so A streams once.
            for h in range(split_n):
                cs = slice(h * bnc, (h + 1) * bnc)
                acc = None
                for e in range(n_ell):
                    a_e = a_blk[:, e * bkb:(e + 1) * bkb]
                    if tout:
                        d = jax.lax.dot_general(
                            slabs[e][:, cs], a_e,
                            (((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        d = jnp.dot(a_e, slabs[e][:, cs],
                                    preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
                store(acc, r, h)
            continue
        # Concatenate into one [ellk, bn] operand: a single deep MXU
        # dot per block-row instead of n_ell shallow ones.
        bg = jax.lax.concatenate(slabs, 0) if n_ell > 1 else slabs[0]
        for h in range(split_n):
            cs = slice(h * bnc, (h + 1) * bnc)
            if tout:
                # C^T orientation: [bnc, bs], n in sublanes (no
                # 128-lane padding for small n).
                res = jax.lax.dot_general(
                    bg[:, cs], a_blk, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                store(res, r, h)
            else:
                store(jnp.dot(a_blk, bg[:, cs],
                              preferred_element_type=jnp.float32), r, h)


def _kernel_db(col_ref, val_ref, b_ref, out_ref, bg_ref, sem_ref, *,
               mblk: int, n_ell: int, bs: int, bkb: int, mb: int,
               tout: bool):
    """Double-buffered slab gather (the NEXT.md item-5 fix).

    The plain gather's per-block-row B-slab slices lower to synchronous
    VMEM copies (~ellk*bn bytes per block-row) serialized with the dot
    — measured time on fat shapes (n >= 512, k >= 1024) is invariant to
    block_k/accum/transpose because that copy, not the MXU, is the
    bound (196x512x2048 sat at 0.59 of SoL). Here block-row r+1's slabs
    are gathered by *async* local DMA into the ping-pong half of a
    [2, ellk, bn] scratch while block-row r's dot consumes the other
    half: copy and MXU time overlap instead of adding.
    """
    ib = pl.program_id(1)

    def copies(r, buf):
        row = (ib * mblk + r) * n_ell
        return [
            pltpu.make_async_copy(
                b_ref.at[pl.ds(col_ref[row + e] * bkb, bkb), :],
                bg_ref.at[buf, pl.ds(e * bkb, bkb), :],
                sem_ref.at[buf, e],
            )
            for e in range(n_ell)
        ]

    for c in copies(0, 0):
        c.start()
    for r in range(mblk):  # static unroll
        buf = r % 2
        if r + 1 < mblk:
            for c in copies(r + 1, 1 - buf):
                c.start()
        for c in copies(r, buf):
            c.wait()
        a_blk = val_ref[r * bs:(r + 1) * bs, :]
        bg = bg_ref[buf]
        if tout:
            res = jax.lax.dot_general(
                bg, a_blk, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[:, r * bs:(r + 1) * bs] = res[
                :out_ref.shape[0]].astype(out_ref.dtype)
        else:
            out_ref[r * bs:(r + 1) * bs, :] = jnp.dot(
                a_blk, bg, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "block_k", "out_dtype", "block_n",
                     "interpret", "transpose_out", "accum_dots",
                     "gather_db", "static_gather", "block_rows_cap",
                     "vmem_budget_mb", "split_n"),
)
def ell_spmm_pallas(
    values: jax.Array,       # [M, ell_blocks * bkb] (batch folded in rows)
    col_indices: jax.Array,  # [M_blocks, ell_blocks] int32
    b: jax.Array,            # [k, n] shared dense operand
    *,
    block_size: int,
    block_k: int = 0,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    transpose_out: bool = False,
    accum_dots: bool = False,
    gather_db: bool = False,
    static_gather: bool = False,
    block_rows_cap: Optional[int] = None,
    vmem_budget_mb: Optional[int] = None,
    split_n: int = 1,
) -> jax.Array:
    """C[M, n] = BlockedEll(values, col_indices) @ b (batch-folded);
    ``transpose_out`` emits C^T [n, M] (column-major convention, no
    lane padding for small n). ``accum_dots`` skips the per-block-row
    slab concatenate in favor of accumulated per-slab dots (see
    `_kernel`); ``gather_db`` double-buffers the slab gather by async
    local DMA against the dot (see `_kernel_db`). Both are
    tuning-table-selectable formulations."""
    if gather_db and accum_dots:
        # `_kernel_db` would silently drop the accum_dots request (the
        # db formulation always dots the gathered slab whole).
        raise ValueError(
            "gather_db and accum_dots are mutually exclusive "
            "formulations; pick one")
    if gather_db and split_n > 1:
        raise ValueError("split_n applies to the gather/accum "
                         "formulations, not gather_db")
    if interpret is None:
        interpret = default_interpret()
    bs = block_size
    bkb = block_k or bs
    m, ellk = values.shape
    m_orig = m
    n_ell = ellk // bkb
    mb = m // bs
    k, n = b.shape
    if col_indices.shape != (mb, n_ell):
        raise ValueError(
            f"col_indices {col_indices.shape} != {(mb, n_ell)}"
        )
    kp = _round_up(k, bkb)
    if kp != k:
        b = jnp.pad(b, ((0, kp - k), (0, 0)))

    # n-tile: as fat as a ~4 MB resident B slab allows. For n < 128 a
    # full-width (non-128) lane block is Mosaic-legal and skips the
    # lane pad — padding to 128 doubles the C write traffic on the
    # n=64 ResNet layers, the dominant bytes there.
    budget = 4 * 1024 * 1024
    bn_cap = max(128, (budget // (kp * b.dtype.itemsize)) // 128 * 128)
    if block_n:
        bn = block_n
    elif n < 128 and n % 8 == 0:
        bn = n
    else:
        bn = min(_round_up(n, 128), 1024, bn_cap)
    np_ = _round_up(n, bn)
    if np_ != n:
        b = jnp.pad(b, ((0, 0), (0, np_ - n)))

    # Block-rows per grid step. Per-step fixed cost (~0.7 us) dominates
    # tall small-k shapes, so go as fat as three budgets allow:
    #   - VMEM: double-buffered values + out tiles + the resident B slab
    #     under ~12 MB;
    #   - code size: the kernel body statically unrolls mblk * n_ell
    #     (gather + dot) pairs — cap the unroll to keep Mosaic compiles
    #     sane;
    #   - occupancy: keep a handful of grid steps so the values/out DMAs
    #     still pipeline against compute.
    vbytes = values.dtype.itemsize
    obytes = jnp.dtype(out_dtype).itemsize
    out_cols = min(bn, np_)  # per-step out lane width (row-major path)
    # The 12 MB default dates from the first Mosaic bring-up; the chip
    # has 128 MB of VMEM and spmm24 already exposes the budget as a
    # tuning knob (vmem_budget_mb) — exposed here too so the tuner can
    # trade fatter mblk/fewer steps against pipeline slack per shape
    # (VERDICT r4 item 2).
    vmem_free = ((vmem_budget_mb or 12) * 1024 * 1024
                 - kp * bn * b.dtype.itemsize)
    if gather_db:
        # Ping-pong gathered-slab scratch lives in VMEM too.
        vmem_free -= 2 * ellk * bn * b.dtype.itemsize
    per_row = 2 * bs * ellk * vbytes + 2 * bs * out_cols * obytes
    mblk_cap = max(1, vmem_free // max(1, per_row))
    mblk_cap = min(mblk_cap, max(1, 256 // max(1, n_ell)), mb)
    if block_rows_cap:
        # Tuner override: on big-m streaming shapes the auto-picked
        # tile (e.g. 64 block-rows = 4 MB of values) can brush the
        # VMEM ceiling once pallas double-buffers it, and the pipeline
        # silently degrades to serial DMA->compute (12544x64x576
        # measured = the serial SUM of A-stream + dots + C-writes).
        # Halving the tile restores overlap at a small per-step cost.
        mblk_cap = min(mblk_cap, block_rows_cap)
    mblk = _pick_mblk(mb, mblk_cap)
    mbp = _cdiv(mb, mblk) * mblk
    if mbp != mb:
        # Padded block-rows: col index 0, values 0 — contribute nothing.
        values = jnp.pad(values, ((0, (mbp - mb) * bs), (0, 0)))
        col_indices = jnp.pad(col_indices, ((0, mbp - mb), (0, 0)))
        mb = mbp
        m = mb * bs

    # Outermost n-tile axis: the resident B slab is re-DMA'd only when
    # the n-tile changes; values/out cycle beneath it.
    grid = (np_ // bn, mb // mblk)

    def _val_idx(j, ib, col):
        return (ib, 0)

    def _b_idx(j, ib, col):
        return (0, j)

    def _out_idx(j, ib, col):
        return (ib, j)

    def _out_idx_t(j, ib, col):
        return (j, ib)

    if transpose_out:
        # Out rows tile at the sublane quantum (8); B's lane tile stays
        # 128-divisible. For n < 128 that means one B tile of width
        # np_ (=128) feeding an out tile of np8 rows.
        np8 = _round_up(n, 8)
        if n < 128:
            out_rows = np8
            grid = (np_ // bn, mb // mblk)  # np_ // bn == 1 here
        else:
            out_rows = bn
            grid = (np_ // bn, mb // mblk)
        out_spec = pl.BlockSpec(
            (out_rows, mblk * bs), _out_idx_t, memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct(
            (np8 if n < 128 else np_, m), out_dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (mblk * bs, bn), _out_idx, memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((m, np_), out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (mblk * bs, ellk), _val_idx, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((kp, bn), _b_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=(
            [pltpu.VMEM((2, ellk, bn), b.dtype),
             pltpu.SemaphoreType.DMA((2, n_ell))]
            if gather_db else []
        ),
    )
    if gather_db:
        body = functools.partial(
            _kernel_db, mblk=mblk, n_ell=n_ell, bs=bs, bkb=bkb, mb=mb,
            tout=transpose_out,
        )
        if interpret is True:
            # Local async copies + DMA semaphores need the TPU
            # interpreter (plain interpret has no semaphore model).
            interpret = pltpu.InterpretParams(
                dma_execution_mode="on_wait")
    else:
        if split_n > 1:
            bnc_chk = bn // split_n if bn % split_n == 0 else 0
            quantum = 8 if transpose_out else 128
            if not bnc_chk or bnc_chk % quantum:
                raise ValueError(
                    f"split_n {split_n} must divide the n-tile {bn} "
                    f"into {quantum}-multiples")
        body = functools.partial(
            _kernel, mblk=mblk, n_ell=n_ell, bs=bs, bkb=bkb, mb=mb,
            tout=transpose_out, accum=accum_dots,
            static_gather=static_gather, split_n=split_n,
        )

    flops = 2 * m * ellk * n
    bytes_accessed = (
        values.size * values.dtype.itemsize
        + b.size * b.dtype.itemsize * (np_ // bn)
        + m * n * jnp.dtype(out_dtype).itemsize
    )

    out = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(col_indices.astype(jnp.int32).reshape(-1), values, b)
    if transpose_out:
        return out[:n, :m_orig]
    return out[:m_orig, :n]


def _kernel_expand(col_ref, val_ref, b_ref, out_ref, af_ref, *,
                   mblk: int, n_ell: int, bs: int, bkb: int, tout: bool):
    ib = pl.program_id(1)
    af_ref[...] = jnp.zeros_like(af_ref)
    for r in range(mblk):  # static unroll: scatter each block-row's slabs
        row = (ib * mblk + r) * n_ell
        for e in range(n_ell):
            af_ref[pl.ds(col_ref[row + e] * bkb, bkb),
                   r * bs:(r + 1) * bs] = (
                val_ref[e * bkb:(e + 1) * bkb, r * bs:(r + 1) * bs]
            )
    if tout:
        res = jax.lax.dot_general(
            b_ref[...], af_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[...] = res[:out_ref.shape[0]].astype(out_ref.dtype)
    else:
        out_ref[...] = jax.lax.dot_general(
            af_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "block_k", "out_dtype",
                     "block_n", "interpret", "transpose_out",
                     "vmem_budget_mb"),
)
def ell_expand_spmm_pallas(
    values_km: jax.Array,    # [ell_blocks * bkb, M] — k-major, batch folded
    col_indices: jax.Array,  # [M_blocks, ell_blocks] int32
    b: jax.Array,            # [k, n] shared dense operand
    *,
    block_size: int,
    block_k: int = 0,
    out_dtype=jnp.bfloat16,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    transpose_out: bool = False,
    vmem_budget_mb: Optional[int] = None,
) -> jax.Array:
    """Expand-in-VMEM Blocked-ELL SpMM for *small-k* layers.

    The gather kernel's per-block-row dots are only ``bkb`` deep — at
    k = 64 that is a [128, 32] x [32, n] sliver per block-row and the
    MXU runs nearly empty (measured 0.44x dense). Here each grid step
    instead scatters its packed slabs into a zeroed dense A^T scratch
    ``[kp, mblk*bs]`` at their block-column offsets (dynamic *sublane*
    writes, granularity 8) and runs ONE fat dense contraction. FLOPs are
    dense — the win is pure HBM bandwidth (packed values are half the
    dense bytes), which is exactly the regime small-k layers live in.
    Values arrive k-major (``[ellk, M]``) so the scatter is a straight
    sublane-aligned copy; `ell_pack` emits this with ``k_major=True``.
    """
    if interpret is None:
        interpret = default_interpret()
    bs = block_size
    bkb = block_k or bs
    ellk, m = values_km.shape
    m_orig = m
    n_ell = ellk // bkb
    mb = m // bs
    k, n = b.shape
    kp = _round_up(k, bkb)
    if kp != k:
        b = jnp.pad(b, ((0, kp - k), (0, 0)))
    # Full-width lane block for n < 128 (see ell_spmm_pallas): halves
    # the C write traffic on n=64 layers vs padding to 128.
    if block_n:
        bn = block_n
    elif n < 128 and n % 8 == 0:
        bn = n
    else:
        bn = min(_round_up(n, 128), 1024)
    np_ = _round_up(n, bn)
    if np_ != n:
        b = jnp.pad(b, ((0, 0), (0, np_ - n)))

    vbytes = values_km.dtype.itemsize
    obytes = jnp.dtype(out_dtype).itemsize
    vmem_free = ((vmem_budget_mb or 12) * 1024 * 1024
                 - kp * bn * b.dtype.itemsize)
    per_row = (2 * bs * ellk * vbytes + 2 * bs * bn * obytes
               + bs * kp * vbytes)  # values + out tiles + af scratch
    mblk_cap = max(1, vmem_free // max(1, per_row))
    mblk_cap = min(mblk_cap, max(1, 64 // max(1, n_ell)), mb)
    mblk = _pick_mblk(mb, mblk_cap)
    mbp = _cdiv(mb, mblk) * mblk
    if mbp != mb:
        values_km = jnp.pad(values_km, ((0, 0), (0, (mbp - mb) * bs)))
        col_indices = jnp.pad(col_indices, ((0, mbp - mb), (0, 0)))
        mb = mbp
        m = mb * bs

    grid = (np_ // bn, mb // mblk)
    if transpose_out:
        np8 = _round_up(n, 8)
        out_rows = np8 if n < 128 else bn
        out_spec = pl.BlockSpec(
            (out_rows, mblk * bs), lambda j, ib, col: (j, ib),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (np8 if n < 128 else np_, m), out_dtype
        )
    else:
        out_spec = pl.BlockSpec(
            (mblk * bs, bn), lambda j, ib, col: (ib, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((m, np_), out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ellk, mblk * bs), lambda j, ib, col: (0, ib),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda j, ib, col: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((kp, mblk * bs), values_km.dtype)],
    )

    flops = 2 * m_orig * kp * n  # dense contraction (no FLOP skip)
    bytes_accessed = (
        values_km.size * vbytes
        + b.size * b.dtype.itemsize * (np_ // bn)
        + m_orig * n * obytes
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel_expand, mblk=mblk, n_ell=n_ell, bs=bs, bkb=bkb,
            tout=transpose_out,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(col_indices.astype(jnp.int32).reshape(-1), values_km, b)
    if transpose_out:
        return out[:n, :m_orig]
    return out[:m_orig, :n]
