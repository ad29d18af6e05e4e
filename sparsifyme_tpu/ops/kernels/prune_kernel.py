"""Pallas VPU kernels: N:M magnitude prune and 2:4 compress.

The reference implements prune as a device-side thrust lambda
(`include/sparsify.me/sparsify.hxx:74-81`) and compress via
`cusparseLtSpMMACompress` (`include/sparsify.me/spmma.hxx:100-103`).
Both ops are pure bandwidth: the arithmetic is a handful of compares per
element. Written as Pallas kernels so the group-local shuffles are
in-register `pltpu.roll`s — the XLA formulation lowers rolls to
concat+slice, which breaks fusion and materializes every intermediate to
HBM (measured: ~10x slower than these kernels' traffic floor).

Ranking semantics (shared with `ops.prune.prune_nm` and the C++ host
runtime): order by (|value|, position), later positions win magnitude
ties; keep the top ``n`` of every contiguous group of ``m``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm24_kernel import _bm_exact, _round_up, default_interpret


def _beat_count(a: jax.Array, pos: jax.Array, m: int, axis: int,
                roll_fn) -> jax.Array:
    """#group members outranking each element; group = m consecutive
    entries along ``axis``, pos = in-group positions (iota % m)."""
    cnt = jnp.zeros(a.shape, jnp.int32)
    for s in range(1, m):
        fwd = roll_fn(a, -s)   # roll_fn handles the negative shift
        bwd = roll_fn(a, m - s)
        wraps = pos + s >= m
        pa = jnp.where(wraps, bwd, fwd)
        ppos = jnp.where(wraps, pos + s - m, pos + s)
        beats = (pa > a) | ((pa == a) & (ppos > pos))
        cnt = cnt + beats.astype(jnp.int32)
    return cnt


def _prune_kernel(x_ref, out_ref, mask_ref, *, n: int, m: int):
    x_full = x_ref[...]
    bk = x_full.shape[1]
    # Chunk at 128 lanes when group boundaries allow: lane rolls across
    # wider axes shift across vregs (measured 2.2x slower at 256).
    cw = 128 if (bk % 128 == 0 or bk > 128) and 128 % m == 0 else bk

    def lane_roll(v, s):  # pltpu.roll needs s >= 0; jnp.roll semantics
        return pltpu.roll(v, s % v.shape[1], 1)

    off = 0
    while off < bk:
        w = min(cw, bk - off)
        x = x_full[:, off:off + w]
        pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % m
        if _key_dtype_ok(x.dtype):
            # One int32 compare per partner (position tiebreak folded
            # into the key's free low mantissa bits) — ~2x fewer VPU
            # ops than the two-compare ranking below.
            cnt = _beat_count_key(_rank_key_i32(x, pos), pos, m,
                                  lane_roll)
        else:
            # Mosaic's rotate only handles 32-bit element types — rank
            # in f32 (|x| comparisons are order-preserving).
            cnt = _beat_count(jnp.abs(x).astype(jnp.float32), pos, m, 1,
                              lane_roll)
        keep = cnt < n
        out_ref[:, off:off + w] = jnp.where(keep, x,
                                            jnp.zeros((), x.dtype))
        mask_ref[:, off:off + w] = keep.astype(mask_ref.dtype)
        off += w


@functools.partial(jax.jit, static_argnames=("n", "m", "interpret",
                                              "block_rows", "block_k"))
def prune_nm_pallas(
    w: jax.Array, n: int = 2, m: int = 4,
    interpret: Optional[bool] = None,
    block_rows: Optional[int] = None,
    block_k: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """N:M magnitude prune along the last axis -> (pruned, mask).

    Groups live in the lane dimension; partner compares are in-register
    lane rolls. One HBM read, two writes — the bandwidth floor.
    """
    if interpret is None:
        interpret = default_interpret()
    *lead, k = w.shape
    w2 = w.reshape(-1, k)
    rows = w2.shape[0]
    kf = w2.shape[1]
    kp = _round_up(kf, max(m, 1))
    # Lane-dim tile must be a multiple of both the group size and 128;
    # pad k so group boundaries never straddle a tile edge.
    # 128-lane tiles: rotates within one vreg lane-width measured
    # fastest (338 GB/s vs 152 GB/s at 256 lanes). Non-128-multiple kp
    # takes ONE full-width tile instead (Mosaic allows full-array lane
    # blocks): a jnp.pad to the next 128 multiple is a full HBM copy of
    # the weights (measured 2.5x floor on k=576 layers).
    if block_k:
        bk = block_k
    elif kp % 128 == 0 or kp > 1536:
        bk = 128
    else:
        bk = kp
    kpp = _round_up(kp, bk)
    if block_rows:
        bm = block_rows
    else:
        # Scoped VMEM for a pallas call is 16 MB; measured footprint is
        # ~26 B per tile element (x/out/mask + f32 rank temps + rolls).
        # Budget 7 MB, prefer fat rows — but prefer an EXACT divisor of
        # the row count: a non-dividing bm pays a full-copy row pad
        # (measured +30% on m=196 layers where 6272 rows pad to 8192).
        cap = max(8, (7 * 1024 * 1024 // (26 * bk)) // 8 * 8)
        cap = min(2048, cap)
        bm = min(_round_up(rows, 8), cap)
        if rows > cap:
            div = next((d for d in range(cap, 7, -8) if rows % d == 0),
                       None)
            if div is not None and div >= cap // 4:
                bm = div
    rp = _round_up(rows, bm)
    if kpp != kf or rp != rows:
        w2 = jnp.pad(w2, ((0, rp - rows), (0, kpp - kf)))

    grid = (rp // bm, kpp // bk)
    out, mask = pl.pallas_call(
        functools.partial(_prune_kernel, n=n, m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, kpp), w.dtype),
            jax.ShapeDtypeStruct((rp, kpp), w.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(w2)
    out = out[:rows, :kf].reshape(*lead, k)
    mask = mask[:rows, :kf].reshape(*lead, k)
    return out, mask


def _key_dtype_ok(dtype) -> bool:
    """True when f32(|x|) has >= 2 free low mantissa bits, so the in-group
    position (0..3) can be OR'd into the bitcast int32 without perturbing
    any magnitude comparison — bf16/f16 widen to f32 with >= 13 zero low
    bits. f32 inputs use the two-compare formulation instead."""
    return jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16),
                                jnp.dtype(jnp.float16))


def _rank_key_i32(x: jax.Array, pos: jax.Array) -> jax.Array:
    """Total-order ranking key as ONE int32: bitcast of f32(|x|) with the
    in-group position in the low bits. For non-negative floats the int32
    bit pattern is monotone in the float value, so a single integer
    compare implements (|value|, position) with later-position-wins-ties
    — the same order `_beat_count`'s three ops compute."""
    af = jnp.abs(x).astype(jnp.float32)
    ki = jax.lax.bitcast_convert_type(af, jnp.int32)
    return ki | pos


def _beat_count_key(key: jax.Array, pos: jax.Array, m: int,
                    roll_fn) -> jax.Array:
    """`_beat_count` with the int32 key: one compare per partner."""
    cnt = jnp.zeros(key.shape, jnp.int32)
    for s in range(1, m):
        fwd = roll_fn(key, -s)
        bwd = roll_fn(key, m - s)
        wraps = pos + s >= m
        pa = jnp.where(wraps, bwd, fwd)
        cnt = cnt + (pa > key).astype(jnp.int32)
    return cnt


def _slot_masks_from_keep(keep32: jax.Array, pos: jax.Array, roll_fn):
    """(m0, m1) slot masks from a 0/1 keep array (exactly 2 kept per
    group). A kept partner at shift s precedes me iff the group index
    wraps (ppos = pos+s-4 < pos), so `kept_before` needs only the
    backward roll masked by the static wrap mask — half the shuffles of
    `_rank_masks_24`'s generic path."""
    kb = jnp.zeros(keep32.shape, jnp.int32)
    for s in range(1, 4):
        wraps = (pos + s >= 4).astype(jnp.int32)
        kb = kb + wraps * roll_fn(keep32, 4 - s)
    m0 = keep32 * (1 - jnp.minimum(kb, 1))
    m1 = keep32 * jnp.where(kb == 1, 1, 0)
    return m0, m1


def _rank_masks_24(a: jax.Array, pos: jax.Array, roll_fn):
    """Slot masks for 2:4 selection: ``(m0, m1)`` int32 0/1 arrays
    marking the first/second kept member of every group of 4 (rank by
    (|value|, position), later positions win ties). ``roll_fn(v, s)``
    must implement jnp.roll semantics along the group axis."""
    cnt = _beat_count(a, pos, 4, 0, roll_fn)
    # All mask algebra in int32: Mosaic mis-lays-out i1&i1 on short
    # tiles ("Invalid relayout ... vector<...xi1>").
    keep32 = jnp.where(cnt < 2, 1, 0)
    # Slot assignment: first/second kept member by position.
    kept_before = jnp.zeros(a.shape, jnp.int32)
    for s in range(1, 4):
        kf = roll_fn(keep32, -s)
        kb = roll_fn(keep32, 4 - s)
        wraps = pos + s >= 4
        pk = jnp.where(wraps, kb, kf)
        ppos = jnp.where(wraps, pos + s - 4, pos + s)
        kept_before = kept_before + pk * jnp.where(ppos < pos, 1, 0)
    m0 = keep32 * (1 - jnp.minimum(kept_before, 1))          # slot 0
    m1 = keep32 * jnp.minimum(kept_before, 1) * jnp.where(
        kept_before < 2, 1, 0)                               # slot 1
    return m0, m1


def _compress_kernel(xt_ref, v0_ref, v1_ref, codes_ref):
    """Input: k-major dense tile [bk (sublanes, groups of 4), bm].
    Outputs: planes [bk//4, bm]."""
    x = xt_ref[...]
    # 32-bit ranks/flags: Mosaic's rotate only handles 32-bit elements.
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % 4

    def sub_roll(v, s):  # pltpu.roll needs s >= 0; jnp.roll semantics
        return pltpu.roll(v, s % v.shape[0], 0)

    if _key_dtype_ok(x.dtype):
        keep32 = jnp.where(
            _beat_count_key(_rank_key_i32(x, pos), pos, 4, sub_roll) < 2,
            1, 0)
        m0, m1 = _slot_masks_from_keep(keep32, pos, sub_roll)
    else:
        m0, m1 = _rank_masks_24(jnp.abs(x).astype(jnp.float32), pos,
                                sub_roll)

    # Group compaction [bk, bm] -> [bk//4, bm] runs on the MXU: a tiny
    # selection matrix S (S[g, 4g+j] = 1) contracts the group axis.
    # Mosaic has no strided vector slices (stride must be 1), and rolls
    # can't compact — but the MXU is idle in this kernel, and S @ x is
    # exact for these 0/1 weights. The contraction costs bk/4 MACs per
    # element, so tiles are kept SHORT (bk=64 default) and the matmul
    # runs in the value dtype when it is exact to do so (one nonzero
    # per group row: no accumulation rounding; f32 values keep f32).
    bk = x.shape[0]
    rr = jax.lax.broadcasted_iota(jnp.int32, (bk // 4, bk), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (bk // 4, bk), 1)
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    sel = (cc // 4 == rr).astype(mm_dtype)

    def gsum(v):
        return jax.lax.dot_general(
            sel, v.astype(mm_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Mask by multiplication (0/1 int masks cast to the value dtype):
    # scalar-broadcast comparisons produce replicated i1 layouts Mosaic
    # cannot relayout ("Invalid relayout ... vector<...xi1>").
    v0_ref[...] = gsum(x * m0.astype(x.dtype)).astype(v0_ref.dtype)
    v1_ref[...] = gsum(x * m1.astype(x.dtype)).astype(v1_ref.dtype)
    posf = pos.astype(mm_dtype)
    i0 = gsum(posf * m0.astype(mm_dtype))
    i1 = gsum(posf * m1.astype(mm_dtype))
    # Mosaic has no f32->uint8 cast; hop through int32.
    codes_ref[...] = (i0 * 4 + i1).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compress_24_pallas(
    wt: jax.Array, interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """2:4 compress of a **k-major** dense matrix ``wt [kp, M]``
    (``kp % 4 == 0``) into planes ``(v0, v1, codes) [kp//4, M]``.

    The caller supplies the k-major transpose (one XLA relayout — the
    only full-size data movement); all group math happens in-register
    on sublanes.
    """
    if interpret is None:
        interpret = default_interpret()
    kp, mm = wt.shape
    if kp % 4:
        raise ValueError(f"k {kp} not a multiple of 4")
    # 128-sublane tiles: gsum costs bk/4 MACs per element (keep bk
    # short), but 64-sublane tiles trigger a Mosaic i1-relayout bug.
    # Prefer an exact divisor of kp: a non-dividing bk forces a
    # full-size jnp.pad copy of the k-major input.
    bk = min(_round_up(kp, 32), 256)
    if kp % bk:
        divs = [d for d in range(256, 31, -32) if kp % d == 0]
        if divs:
            bk = divs[0]
    kpp = _round_up(kp, bk)
    # Scoped VMEM is 16 MB; input tile + plane tiles + f32 temps cost
    # ~16 B per input element. Budget 8 MB.
    cap = max(128, (8 * 1024 * 1024 // (16 * bk)) // 128 * 128)
    bm = min(_round_up(mm, 128), 1024, cap)
    mp = _round_up(mm, bm)
    if kpp != kp or mp != mm:
        wt = jnp.pad(wt, ((0, kpp - kp), (0, mp - mm)))

    grid = (kpp // bk, mp // bm)
    bspec = pl.BlockSpec((bk, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((bk // 4, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    v0, v1, codes = pl.pallas_call(
        _compress_kernel,
        grid=grid,
        in_specs=[bspec],
        out_specs=[pspec, pspec, pspec],
        out_shape=[
            jax.ShapeDtypeStruct((kpp // 4, mp), wt.dtype),
            jax.ShapeDtypeStruct((kpp // 4, mp), wt.dtype),
            jax.ShapeDtypeStruct((kpp // 4, mp), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(wt)
    k4 = kp // 4
    return v0[:k4, :mm], v1[:k4, :mm], codes[:k4, :mm]


def _gsum_sel(x, m0, m1, pos, mm_dtype):
    """Group-compact via an MXU selection matmul, row-major: groups of 4
    live in the LANE axis. ``x*(mask)`` [bm, bk] @ selT [bk, bk//4]
    (selT[4g+j, g] = 1) contracts the group axis in the standard
    MXU-native form. One nonzero per contraction column per group row:
    no accumulation rounding, so bf16 inputs may compact in bf16."""
    bk = x.shape[1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (bk, bk // 4), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (bk, bk // 4), 1)
    selT = (rr // 4 == cc).astype(mm_dtype)

    def gsum(v):
        return jax.lax.dot_general(
            v.astype(mm_dtype), selT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    cv0 = gsum(x * m0.astype(x.dtype))
    cv1 = gsum(x * m1.astype(x.dtype))
    posf = pos.astype(mm_dtype)
    i0 = gsum(posf * m0.astype(mm_dtype))
    i1 = gsum(posf * m1.astype(mm_dtype))
    return cv0, cv1, i0, i1


def _fused_kernel_rm(x_ref, v0_ref, v1_ref, codes_ref):
    """Fused prune+compress, row-major in AND out: dense tile
    [bm, bk (lanes, groups of 4)] -> compact planes [bm, bk//4].
    Selection = magnitude top-2 per group (identical to prune_nm's
    ranking), so this subsumes the prune phase: one HBM read of the
    dense weights, compact writes only."""
    x = x_ref[...]
    a = jnp.abs(x).astype(jnp.float32)
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 4

    def lane_roll(v, s):
        return pltpu.roll(v, s % v.shape[1], 1)

    m0, m1 = _rank_masks_24(a, pos, lane_roll)
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    cv0, cv1, i0, i1 = _gsum_sel(x, m0, m1, pos, mm_dtype)
    v0_ref[...] = cv0.astype(v0_ref.dtype)
    v1_ref[...] = cv1.astype(v1_ref.dtype)
    # Mosaic has no f32->uint8 cast; hop through int32.
    codes_ref[...] = (i0 * 4 + i1).astype(jnp.int32).astype(jnp.uint8)


def _rank_masks_mxu(x, pos, mm_dtype):
    """Slot masks computed with MXU assistance: group-local rotations
    of |x| ride exact 0/1-matrix f32 contractions instead of lane
    rolls, and the kept-before prefix rides a strictly-lower-triangular
    contraction. VPU work drops from ~35 to ~20 ops/elem; the extra
    dots (~4*128 MACs/elem) run on the otherwise-lightly-loaded MXU.

    Exactness (bf16 inputs only — the caller gates): |x| is
    bf16-representable, each rotation matrix has ONE 0/1 nonzero per
    output row, and f32 accumulation of a single exact product is the
    permuted value bit-exactly. The ranking order — (|value|,
    position), later positions win ties — is enforced by static
    per-lane tiebreak masks (position comparisons are lane-static for a
    fixed rotation), so selection matches `_beat_count` bit-for-bit."""
    w = x.shape[1]
    a = jnp.abs(x)                       # bf16, exact
    af = a.astype(jnp.float32)
    cc = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)  # out lane
    rr = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)  # in lane
    same_group = (cc // 4) == (rr // 4)
    cnt = jnp.zeros(x.shape, jnp.int32)
    for s in range(1, 4):
        # rot_s[i] = a[group-local i+s mod 4]: R[i, j] = 1 where j is
        # my s-th partner. a @ R^T with R as [out, in].
        rot = ((rr % 4) == ((cc + s) % 4)) & same_group
        pa = jax.lax.dot_general(
            a, rot.astype(a.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Partner position (pos+s) mod 4 > pos iff pos < 4-s: static
        # per lane.
        tie = (pos + s) < 4
        beats = (pa > af) | ((pa == af) & tie)
        cnt = cnt + beats.astype(jnp.int32)
    keep = jnp.where(cnt < 2, 1.0, 0.0).astype(a.dtype)
    # kept_before = # kept group members at earlier positions: a
    # strictly-lower-triangular (within group) contraction of keep.
    lower = (same_group & (rr < cc)).astype(a.dtype)
    kb = jax.lax.dot_general(
        keep, lower, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    keepf = keep.astype(jnp.float32)
    m0 = (keepf * jnp.where(kb == 0, 1.0, 0.0)).astype(mm_dtype)
    m1 = (keepf * jnp.where(kb == 1, 1.0, 0.0)).astype(mm_dtype)
    return m0, m1


def _lane_pad(x, bk: int):
    """Pad a tile's lane axis to ``bk`` inside VMEM (VREG zeros).

    Odd-k shapes used to pad the DENSE input in HBM before the kernel
    (`jnp.pad` of the whole [rows, k] array = one extra full read+write
    pass — measured at ~the HBM floor itself on k=147, the single
    largest term in its 4x-over-floor). Taking the unpadded full-width
    tile and padding lanes here costs only VREG writes; padded groups
    rank to zero values / code 1 and their plane rows are sliced off by
    the caller."""
    if x.shape[1] < bk:
        x = jnp.pad(x, ((0, 0), (0, bk - x.shape[1])))
    return x


def _fused_kernel_v3(x_ref, v0_ref, v1_ref, codes_ref, *, bk: int):
    """Fused prune+compress with MXU-assisted ranking (see
    `_rank_masks_mxu`); same tile contract as `_fused_kernel_v2`."""
    x_full = _lane_pad(x_ref[...], bk)
    mm_dtype = x_full.dtype if x_full.dtype == jnp.bfloat16 \
        else jnp.float32

    dn = (((1,), (1,)), ((), ()))  # contract both lane dims: sel @ xm^T
    off = 0
    while off < bk:
        w = min(128, bk - off)
        x = x_full[:, off:off + w]
        pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 4
        m0, m1 = _rank_masks_mxu(x, pos, jnp.float32)
        xm0 = (x.astype(jnp.float32) * m0).astype(mm_dtype)
        xm1 = (x.astype(jnp.float32) * m1).astype(mm_dtype)
        code_src = (pos.astype(jnp.float32)
                    * (4.0 * m0 + m1)).astype(mm_dtype)

        rr = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 1)
        sel = (cc // 4 == rr).astype(mm_dtype)
        g = slice(off // 4, (off + w) // 4)
        v0_ref[g, :] = jax.lax.dot_general(
            sel, xm0, dn, preferred_element_type=jnp.float32,
        ).astype(v0_ref.dtype)
        v1_ref[g, :] = jax.lax.dot_general(
            sel, xm1, dn, preferred_element_type=jnp.float32,
        ).astype(v1_ref.dtype)
        codes_ref[g, :] = jax.lax.dot_general(
            sel, code_src, dn, preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint8)
        off += w


def _fused_kernel_v2(x_ref, v0_ref, v1_ref, codes_ref, *, bk: int,
                     use_key: bool, pack_rank: bool = False):
    """Fused prune+compress v2: row-major dense tile [bm, bk] in,
    k-major compact planes [bk//4, bm] out, with NO in-kernel f32
    transpose and O(32) bf16 MACs/element compaction.

    Round-2's `_fused_kernel_km` measured ~4x its HBM floor: the VMEM
    f32 transpose plus a full-width f32 selection matmul (bk/4 MACs per
    element PER gsum, four gsums) dominated. Here:

      * ranking runs in the input's own row-major layout (lane rolls),
        with the int32-key trick (`_rank_key_i32`) when the dtype allows
        — one compare per partner instead of three ops;
      * compaction AND the k-major relayout are one MXU contraction per
        128-lane chunk: ``sel[w/4, w] @ xm[bm, w]^T`` (the standard
        A@B^T dimension numbers) emits the [w/4, bm] plane rows
        directly — 32 MACs/element in the value dtype (exact: one
        nonzero per group per masked operand);
      * the codes need ONE dot, not two: ``sel @ (pos*(4*m0+m1))^T``
        sums to ``4*i0 + i1`` per group (both terms are small ints,
        exact in bf16).
    """
    x_full = _lane_pad(x_ref[...], bk)
    mm_dtype = x_full.dtype if x_full.dtype == jnp.bfloat16 \
        else jnp.float32

    def lane_roll(v, s):
        return pltpu.roll(v, s % v.shape[1], 1)

    dn = (((1,), (1,)), ((), ()))  # contract both lane dims: sel @ xm^T
    off = 0
    while off < bk:
        # EVERYTHING is chunked at 128 lanes — ranking included: a
        # pltpu.roll across a wider lane axis shifts across vregs
        # (measured 2.2x slower at 256 lanes than 128, and the round-3
        # probe showed whole-tile ranking at ~5x the HBM floor, the
        # dots nearly free). Groups of 4 never straddle a 128 boundary.
        w = min(128, bk - off)
        x = x_full[:, off:off + w]
        pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 4
        f = (128 // w if (pack_rank and w < 128 and 128 % w == 0
                          and x.shape[0] % max(1, 128 // w) == 0)
             else 1)
        if f > 1:
            # Lane-pack f consecutive rows into one 128-lane vector for
            # the RANKING only: every roll/select in the 2:4 ranking is
            # 4-periodic in lanes (a roll-by-s value is selected only at
            # positions p % 4 >= s, whose sources sit in the same
            # 4-group), so nothing leaks across the packed w-lane
            # boundaries — the dead half-width VPU lanes do real work.
            # The masks reshape back for the w-wide compaction dots.
            xr = x.reshape(x.shape[0] // f, f * w)
            posr = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 1) % 4
        else:
            xr, posr = x, pos
        if use_key:
            key = _rank_key_i32(xr, posr)
            keep32 = jnp.where(
                _beat_count_key(key, posr, 4, lane_roll) < 2, 1, 0)
            m0, m1 = _slot_masks_from_keep(keep32, posr, lane_roll)
        else:
            m0, m1 = _rank_masks_24(jnp.abs(xr).astype(jnp.float32),
                                    posr, lane_roll)
        if f > 1:
            m0 = m0.reshape(x.shape)
            m1 = m1.reshape(x.shape)
        xm0 = (x * m0.astype(x.dtype)).astype(mm_dtype)
        xm1 = (x * m1.astype(x.dtype)).astype(mm_dtype)
        code_src = (pos * (4 * m0 + m1)).astype(mm_dtype)

        rr = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 1)
        sel = (cc // 4 == rr).astype(mm_dtype)
        g = slice(off // 4, (off + w) // 4)
        v0_ref[g, :] = jax.lax.dot_general(
            sel, xm0, dn, preferred_element_type=jnp.float32,
        ).astype(v0_ref.dtype)
        v1_ref[g, :] = jax.lax.dot_general(
            sel, xm1, dn, preferred_element_type=jnp.float32,
        ).astype(v1_ref.dtype)
        codes_ref[g, :] = jax.lax.dot_general(
            sel, code_src, dn, preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint8)
        off += w


@functools.partial(jax.jit, static_argnames=("interpret", "kmajor",
                                              "block_rows", "block_k",
                                              "rank_mxu", "pad128",
                                              "pack_rank"))
def prune_compress_24_pallas(
    w: jax.Array,
    interpret: Optional[bool] = None,
    kmajor: bool = True,
    block_rows: Optional[int] = None,
    block_k: Optional[int] = None,
    rank_mxu: bool = False,
    pad128: bool = True,
    pack_rank: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused prune+compress: row-major dense ``w [..., m, k]`` ->
    k-major planes ``(v0, v1, codes) [k4, M]`` in ONE kernel pass.

    The reference runs prune (`cusparseLtSpMMAPrune`, a full dense
    read+write) and compress (`cusparseLtSpMMACompress`, another full
    read) as separate phases (`spmma.hxx:85-103`); since our compress
    ranking IS the prune ranking, the fusion reads the dense weights
    once and writes only the compressed planes (~1.25 B/elem out vs
    2 B/elem in). ``kmajor=True`` additionally folds the k-major
    relayout into the kernel's VMEM transpose; ``kmajor=False`` writes
    row-major compact planes and pays one small XLA transpose
    (compact-size, not dense-size) outside.
    """
    if interpret is None:
        interpret = default_interpret()
    *lead, k = w.shape
    w2 = w.reshape(-1, k)
    rows = w2.shape[0]
    # k4 stores at a multiple of 16 (see compress_24): pad k to 64 and
    # pick bk as an exact divisor so the planes never over-pad.
    kp = _round_up(k, 64)

    if kmajor:
        # Input tile [bm, bk]: Mosaic requires the lane-dim block to be a
        # multiple of 128 OR the full array width. Fat k-tiles amortize
        # the per-grid-step fixed cost (the v2 kernel's compaction is
        # chunked at 128 lanes internally, so bk does not change the
        # MACs/element); for non-128-multiple kp take one full-width
        # tile (grid j = 1) up to a VMEM-safe width, else pad lanes to a
        # 128 multiple (padded groups compress to zero planes, sliced
        # off below).
        if block_k:
            bk = block_k
        elif kp % 128 == 0:
            bk = next(d for d in (512, 384, 256, 128) if kp % d == 0)
        elif kp <= 1280:
            # Full-width single k-tile, lanes padded IN-KERNEL (see
            # `_lane_pad` — no HBM pad pass). ``pad128`` rounds the
            # tile up to a 128-lane multiple so every internal
            # 128-chunk is a full vreg set (the 64-wide tail chunk's
            # lane rolls are sub-vreg); costs +rank work on dead lanes,
            # hence tunable.
            bk = _round_up(kp, 128) if pad128 else kp
        else:
            bk = 128
        if block_rows:
            bm = block_rows
        else:
            # ~512K-element tiles: big enough that HBM streaming beats
            # the ~0.7us/step fixed cost, small enough for scoped VMEM
            # (see vmem_limit below). Exact %128 divisors of the row
            # count avoid a full-size jnp.pad copy of the dense input.
            cap = max(128, ((1 << 19) // bk) // 128 * 128)
            exact = _bm_exact(rows, cap)
            bm = exact[0] if exact else min(cap, _round_up(rows, 128))
    else:
        # Compact planes keep k//4 in lanes: the OUTPUT tile [bm, bk//4]
        # needs bk//4 % 128 == 0 (bk mult of 512) or full-width. Same
        # rule as above, scaled by the 4x group compaction.
        if block_k:
            bk = block_k
        elif kp % 512 == 0:
            bk = 512
        elif kp <= 2048:
            bk = kp
        else:
            bk = 512
        # Scale rows down for wide full-width tiles: f32 rank temps +
        # the [bk, bk//4] selection matrix approach the scoped-VMEM
        # budget past bk ~1024 (advisor round-2 finding).
        bm = block_rows or (256 if bk <= 1024 else 128)
    kpp = _round_up(kp, bk)
    rp = _round_up(rows, bm)
    # Single full-width k-tile: feed the UNPADDED lane width and let the
    # kernel pad in VMEM — the caller-side jnp.pad of the dense input is
    # a full extra HBM read+write pass (the dominant term on k=147).
    lane_pad_in_kernel = kmajor and kpp == bk and bk >= k
    if lane_pad_in_kernel:
        if rp != rows:
            w2 = jnp.pad(w2, ((0, rp - rows), (0, 0)))
    elif kpp != k or rp != rows:
        w2 = jnp.pad(w2, ((0, rp - rows), (0, kpp - k)))

    grid = (rp // bm, kpp // bk)
    in_spec = pl.BlockSpec((bm, k if lane_pad_in_kernel else bk),
                           lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    if kmajor:
        pspec = pl.BlockSpec((bk // 4, bm), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM)
        out_shape = [
            jax.ShapeDtypeStruct((kpp // 4, rp), w.dtype),
            jax.ShapeDtypeStruct((kpp // 4, rp), w.dtype),
            jax.ShapeDtypeStruct((kpp // 4, rp), jnp.uint8),
        ]
        if rank_mxu and w.dtype == jnp.bfloat16:
            # MXU-assisted ranking (bf16 only — exactness argument in
            # `_rank_masks_mxu`): selectable A/B against the key-trick
            # VPU ranking.
            kernel = functools.partial(_fused_kernel_v3, bk=bk)
        else:
            kernel = functools.partial(_fused_kernel_v2, bk=bk,
                                       use_key=_key_dtype_ok(w.dtype),
                                       pack_rank=pack_rank)
    else:
        pspec = pl.BlockSpec((bm, bk // 4), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        out_shape = [
            jax.ShapeDtypeStruct((rp, kpp // 4), w.dtype),
            jax.ShapeDtypeStruct((rp, kpp // 4), w.dtype),
            jax.ShapeDtypeStruct((rp, kpp // 4), jnp.uint8),
        ]
        kernel = _fused_kernel_rm
    v0, v1, codes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec],
        out_specs=[pspec, pspec, pspec],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # Fat tiles: the v2 kernel's rank temps (int32) run ~5x the
            # block-spec bytes; v5e has 128 MB physical VMEM.
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(w2)
    k4 = kp // 4
    if not kmajor:
        v0, v1, codes = v0.T, v1.T, codes.T  # compact-size relayout
    return v0[:k4, :rows], v1[:k4, :rows], codes[:k4, :rows]
