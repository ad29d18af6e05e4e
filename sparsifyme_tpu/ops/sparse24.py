"""2:4 structured sparsity: compress, decompress, and SpMM entry points.

TPU-native re-implementation of the reference's cusparseLt spmma pipeline
(`include/sparsify.me/spmma.hxx:21-118` and the vendored API contract
`examples/libcusparse_lt/include/cusparseLt.h`): the three phases
prune -> compress -> matmul become :mod:`.prune` ops, :func:`compress_24`,
and :func:`spmm_24` (a Pallas MXU kernel that expands the compressed
operand tile-wise in VMEM — Ampere sparse tensor cores do not exist on TPU,
so the win is halved weight traffic from HBM, not halved FLOPs).

Compressed layout (see :class:`~sparsifyme_tpu.containers.Sparse24`):
two **k-major, batch-folded** value planes ``values0/values1 [k4, M]``
(``M = prod(batch) * m``) and a ``codes`` uint8 plane with ``i0*4+i1``
per group. k-major keeps the group axis in the TPU sublane dimension
(padding quantum 16/32 instead of the 128-lane quantum), so small-k
layers pay dense-like padding; batch-folding turns the reference's
batch-of-thin-matmuls into one fat matmul against the shared B
(`spmm.hxx:67`). The kernel decompresses with sublane-aligned VPU ops
only — no gathers, no lane shuffles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..containers import Sparse24
from .prune import _pad_to_multiple


@jax.jit
def compress_24(w: jax.Array) -> Sparse24:
    """Compress a (2:4-pruned) matrix into :class:`Sparse24`.

    The compress phase of the pipeline (`cusparseLtSpMMACompress`,
    `spmma.hxx:100-103`). The two largest-magnitude elements of every
    contiguous group of 4 along the last axis are kept (ties broken by
    position, matching :func:`~.prune.prune_nm`); for an input that is
    already exactly 2:4 this selects precisely the nonzeros.
    """
    *lead, m, k = w.shape
    # Fold batch dims into rows (free reshape), pad k to a group
    # multiple, then transpose ONCE into the k-major [kp, M] layout.
    # k pads to 64 (not 4) so the stored group count k4 is a multiple of
    # 16 — the bf16 sublane quantum. The SpMM kernels then always find
    # a tile edge at k4 and never re-pad the planes at call time (a
    # jnp.pad there is a full HBM copy of A per call — measured as the
    # round-1 kernels' largest hidden cost on odd-k layers like k=147).
    # Padded groups hold zeros with valid codes; they contribute 0.
    w2 = w.reshape(-1, k)
    wp = _pad_to_multiple(w2, -1, 64)
    if jax.default_backend() == "tpu":
        # Pallas kernel on the k-major transpose: the relayout is the
        # only full-size data movement; group math is in-register.
        from .kernels.prune_kernel import compress_24_pallas

        v0, v1, codes = compress_24_pallas(jnp.swapaxes(wp, -1, -2))
        return Sparse24(values0=v0, values1=v1, codes=codes, shape=w.shape)
    # Do all group math in the
    # target k-major layout, where a group is 4 consecutive *sublanes*:
    # sublane rolls and stride-4 sublane slices are cheap VPU shuffles.
    # (The obvious formulation — reshape groups into a trailing
    # length-4 axis — hands TPU a 4-element lane dim padded to 128.)
    wt = jnp.swapaxes(wp, -1, -2)  # (..., kp, m)
    a = jnp.abs(wt)
    gaxis = wt.ndim - 2
    pos = jax.lax.broadcasted_iota(jnp.int32, wt.shape, gaxis) % 4
    cnt = jnp.zeros(wt.shape, jnp.int32)       # members outranking me
    partners = []                              # (keep-partner fodder)
    for s in range(1, 4):
        fwd = jnp.roll(a, -s, axis=gaxis)
        bwd = jnp.roll(a, 4 - s, axis=gaxis)
        wraps = pos + s >= 4
        pa = jnp.where(wraps, bwd, fwd)
        ppos = jnp.where(wraps, pos + s - 4, pos + s)
        beats = (pa > a) | ((pa == a) & (ppos > pos))
        cnt = cnt + beats.astype(jnp.int32)
        partners.append((s, wraps, ppos))
    keep = cnt < 2                             # exactly 2 per group
    # How many kept members precede me in my group -> first/second slot.
    kept_before = jnp.zeros(wt.shape, jnp.int32)
    for s, wraps, ppos in partners:
        kf = jnp.roll(keep, -s, axis=gaxis)
        kb = jnp.roll(keep, 4 - s, axis=gaxis)
        pk = jnp.where(wraps, kb, kf)
        kept_before = kept_before + (pk & (ppos < pos)).astype(jnp.int32)
    is0 = keep & (kept_before == 0)
    is1 = keep & (kept_before == 1)

    def _gsum(x):  # per-group sum: stride-4 sublane slices, 3 adds
        sl = [
            jax.lax.slice_in_dim(x, j, x.shape[gaxis], stride=4, axis=gaxis)
            for j in range(4)
        ]
        return sl[0] + sl[1] + sl[2] + sl[3]

    zero = jnp.zeros([], wt.dtype)
    v0 = _gsum(jnp.where(is0, wt, zero))
    v1 = _gsum(jnp.where(is1, wt, zero))
    i0 = _gsum(jnp.where(is0, pos, 0))
    i1 = _gsum(jnp.where(is1, pos, 0))
    codes = (i0 * 4 + i1).astype(jnp.uint8)
    return Sparse24(
        values0=v0.astype(w.dtype),
        values1=v1.astype(w.dtype),
        codes=codes,
        shape=w.shape,
    )


def _unfold_planes(p: jax.Array, f: int, k4: int, rows: int) -> jax.Array:
    """Inverse of the row-fold for compact planes: the folded kernel
    emits [f*k4, rows/f] where plane-row g < k4 belongs to original row
    f*j and g >= k4 to row f*j+1 (row-major fold); un-interleave to the
    standard [k4, rows] layout. Compact-size transpose (1.125 B/elem of
    the ORIGINAL dense input across all three planes), not dense-size."""
    return p.reshape(f, k4, rows // f).transpose(1, 2, 0).reshape(
        k4, rows)


@functools.partial(jax.jit, static_argnames=("rank_mxu", "block_rows",
                                             "block_k", "pad128",
                                             "pack_rank", "fold_rows",
                                             "fold"))
def prune_compress_24(w: jax.Array, rank_mxu: bool = False,
                      block_rows: "Optional[int]" = None,
                      block_k: "Optional[int]" = None,
                      pad128: bool = True,
                      pack_rank: bool = False,
                      fold_rows: bool = False,
                      fold: int = 1) -> Sparse24:
    """Fused prune+compress: dense ``w`` -> :class:`Sparse24` in one
    kernel pass (one HBM read of the dense weights, compact writes).

    The reference runs prune and compress as separate full-size device
    phases (`cusparseLtSpMMAPrune` + `cusparseLtSpMMACompress`,
    `spmma.hxx:85-103`); because :func:`compress_24`'s ranking is
    exactly :func:`~.prune.prune_nm`'s (top-2 magnitude per group of 4,
    later positions win ties), the fusion is semantically
    ``compress_24(prune_nm(w)[0])`` — bit-identical planes — at ~1/4 of
    the HBM traffic (no pruned-dense round trip, no full-size k-major
    pre-transpose). ``rank_mxu`` selects the MXU-assisted ranking
    formulation (bf16 only; see `prune_kernel._rank_masks_mxu`) — a
    benchmark-raceable A/B, identical selection. ``block_rows`` /
    ``block_k`` / ``pad128`` override the kernel tiling (per-shape
    tuning-table knobs).
    """
    *lead, m, k = w.shape
    if fold > 1:
        # END-TO-END folded layout (round 5, NEXT.md item 2's surviving
        # option): rank/compress on the free row-major
        # ``[rows, kp] -> [rows/f, f*kp]`` reshape — full-vreg lane
        # width for narrow k — and KEEP the planes folded
        # (``[f*k4, rows/f]``, Sparse24.fold = f). No un-interleave is
        # paid here, and `spmm24_fold_pallas` contracts the folded
        # planes directly. Selection is unchanged: kp is a multiple of
        # 64, so groups of 4 never straddle the fold seam.
        if fold != 2:
            raise ValueError(f"fold {fold} unsupported (use 2)")
        w2 = w.reshape(-1, k)
        rows = w2.shape[0]
        if rows % fold:
            raise ValueError(f"rows {rows} % fold {fold} != 0")
        kp = -(-k // 64) * 64  # compress_24's k padding quantum
        wp = _pad_to_multiple(w2, -1, 64) if kp != k else w2
        wf = wp.reshape(rows // fold, fold * kp)
        if jax.default_backend() == "tpu":
            from .kernels.prune_kernel import prune_compress_24_pallas

            v0, v1, codes = prune_compress_24_pallas(
                wf, rank_mxu=rank_mxu, block_rows=block_rows,
                block_k=block_k, pad128=pad128)
        else:
            sc = compress_24(wf)
            v0, v1, codes = sc.values0, sc.values1, sc.codes
        return Sparse24(values0=v0, values1=v1, codes=codes,
                        shape=w.shape, fold=fold)
    if jax.default_backend() == "tpu":
        from .kernels.prune_kernel import prune_compress_24_pallas

        w2 = w.reshape(-1, k)
        rows = w2.shape[0]
        if fold_rows and k == 64 and rows % 2 == 0:
            # Row-fold for narrow k: [rows, 64] -> [rows/2, 128] is a
            # free XLA reshape (row-major), groups of 4 stay intact,
            # and the kernel's lane rolls/dots run at FULL vreg/MXU
            # width instead of half (the in-kernel sublane->lane
            # reshape Mosaic rejects: "unsupported shape cast"). Costs
            # one compact-size plane un-interleave afterwards.
            wf = w2.reshape(rows // 2, 128)
            v0, v1, codes = prune_compress_24_pallas(
                wf, rank_mxu=rank_mxu, block_rows=block_rows,
                block_k=block_k, pad128=True)
            k4 = k // 4
            return Sparse24(
                values0=_unfold_planes(v0, 2, k4, rows),
                values1=_unfold_planes(v1, 2, k4, rows),
                codes=_unfold_planes(codes, 2, k4, rows),
                shape=w.shape)
        v0, v1, codes = prune_compress_24_pallas(
            w2, rank_mxu=rank_mxu, block_rows=block_rows,
            block_k=block_k, pad128=pad128, pack_rank=pack_rank)
        return Sparse24(values0=v0, values1=v1, codes=codes, shape=w.shape)
    # XLA path: compress_24 already selects top-2 per group from dense.
    return compress_24(w)


@jax.jit
def decompress_24(s: Sparse24) -> jax.Array:
    """Expand a :class:`Sparse24` back to dense (the exact inverse of
    :func:`compress_24` up to the pruned zeros).

    Works in the k-major layout (groups = sublanes): each value plane is
    sublane-repeated 4x and masked where the repeated group row's
    in-group position matches the code — no gathers, no trailing-4
    reshapes. One transpose at the end returns the row-major dense.
    Folded-layout operands (``s.fold > 1``) are un-folded first
    (compact-size un-interleave) — the oracle path, not the hot one.
    """
    if s.fold > 1:
        f = s.fold
        fk4, mf = s.values0.shape
        k4u, rows = fk4 // f, mf * f
        s = Sparse24(
            values0=_unfold_planes(s.values0, f, k4u, rows),
            values1=_unfold_planes(s.values1, f, k4u, rows),
            codes=_unfold_planes(s.codes, f, k4u, rows),
            shape=s.shape,
        )
    k4, m = s.values0.shape
    codes = s.codes.astype(jnp.int32)
    i0 = codes >> 2
    i1 = codes & 3

    def _expand(v, idx):
        # [k4, m] -> [4*k4, m]: row 4g+j holds v[g] where idx[g] == j.
        vr = jnp.repeat(v, 4, axis=0)
        ir = jnp.repeat(idx, 4, axis=0)
        j = jax.lax.broadcasted_iota(jnp.int32, vr.shape, 0) % 4
        return jnp.where(ir == j, vr, jnp.zeros([], v.dtype))

    dense_km = _expand(s.values0, i0) + _expand(s.values1, i1)  # [4k4, m]
    dense = dense_km.T[:, : s.shape[-1]]
    return dense.reshape(*s.shape[:-1], s.shape[-1])


def spmm_24_reference(s: Sparse24, b: jax.Array, *, out_dtype=None) -> jax.Array:
    """Dense-oracle SpMM: decompress then matmul (for tests/CPU)."""
    a = decompress_24(s)
    out_dtype = out_dtype or jnp.promote_types(a.dtype, b.dtype)
    return jnp.matmul(
        a, b, preferred_element_type=jnp.float32
    ).astype(out_dtype)


import collections

_Cfg = collections.namedtuple(
    "_Cfg",
    "k_logical out_dtype block_m block_n block_k4 interpret transpose_out "
    "pipeline packed row_chunks k_chunks budget_mb",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm24_core(cfg: "_Cfg", v0, v1, codes, b):
    from .kernels.spmm24_kernel import spmm24_pallas, spmm24_pallas_fp

    if cfg.pipeline:
        # Fully-pipelined formulation: single n-tile, VPU expand of
        # k-tile t overlapping the MXU dot of t-1 through
        # double-buffered VMEM slabs. Wins on most bandwidth-bound
        # layers; the classic grid wins elsewhere — matmul_search /
        # the bench harness picks per shape (the alg-selection story).
        # ``cfg.packed``: consume split-half packed codes (1.125 B/elem
        # A traffic). The pack runs per call here — callers that can
        # hoist it (the bench harness, plan.set_operand) pre-pack and
        # call the kernel directly instead.
        return spmm24_pallas_fp(
            v0,
            v1,
            pack_codes_fp(codes) if cfg.packed else codes,
            b,
            k_logical=cfg.k_logical,
            out_dtype=cfg.out_dtype,
            block_m=cfg.block_m,
            block_k4=cfg.block_k4,
            interpret=cfg.interpret,
            transpose_out=cfg.transpose_out,
            packed_codes=cfg.packed,
            row_chunks=cfg.row_chunks,
            k_chunks=cfg.k_chunks,
            vmem_budget_mb=cfg.budget_mb,
        )
    return spmm24_pallas(
        v0,
        v1,
        codes,
        b,
        k_logical=cfg.k_logical,
        out_dtype=cfg.out_dtype,
        block_m=cfg.block_m,
        block_n=cfg.block_n,
        block_k4=cfg.block_k4,
        interpret=cfg.interpret,
        transpose_out=cfg.transpose_out,
    )


def _spmm24_fwd(cfg, v0, v1, codes, b):
    return _spmm24_core(cfg, v0, v1, codes, b), (v0, v1, codes, b)


def _spmm24_bwd(cfg, res, g):
    import numpy as np

    v0, v1, codes, b = res  # k-major folded planes [k4, M]; g [M, n]
    if cfg.transpose_out:
        # C^T cotangent arrives [n, M]; the math below is layout-blind
        # once g is row-major (round-1 gap: transpose_out had no VJP).
        g = g.T
    k4, m = v0.shape
    kl = cfg.k_logical
    g32 = g.astype(jnp.float32)
    # dense A for db (decompressed once; a fused bwd kernel is a later
    # optimization — XLA handles these matmuls on the MXU already).
    s_tmp = Sparse24(v0, v1, codes, shape=(m, kl))
    a = decompress_24(s_tmp).astype(jnp.float32)  # [M, kl]
    db = jnp.einsum(
        "mk,mn->kn", a, g32, preferred_element_type=jnp.float32
    )
    # dA at the kept positions -> dv0 / dv1, computed k-major: dA^T
    # [kp, M] sampled at row 4g+i is a repeat+mask+group-sum — the same
    # sublane machinery as compress, no gathers.
    daT = jnp.matmul(
        b[:kl].astype(jnp.float32), g32.T,
        preferred_element_type=jnp.float32,
    )  # [kl, M]
    daT = jnp.pad(daT, ((0, 4 * k4 - kl), (0, 0)))
    ci = codes.astype(jnp.int32)
    i0r = jnp.repeat(ci >> 2, 4, axis=0)
    i1r = jnp.repeat(ci & 3, 4, axis=0)
    j = jax.lax.broadcasted_iota(jnp.int32, daT.shape, 0) % 4

    def _gsum(x):
        return (x[0::4] + x[1::4]) + (x[2::4] + x[3::4])

    dv0 = _gsum(jnp.where(i0r == j, daT, 0.0))
    dv1 = _gsum(jnp.where(i1r == j, daT, 0.0))
    dcodes = np.zeros(codes.shape, dtype=jax.dtypes.float0)
    return (
        dv0.astype(v0.dtype),
        dv1.astype(v1.dtype),
        dcodes,
        db.astype(b.dtype),
    )


_spmm24_core.defvjp(_spmm24_fwd, _spmm24_bwd)


def spmm_24(
    s: Sparse24,
    b: jax.Array,
    *,
    out_dtype=None,
    alpha: float = 1.0,
    beta: float = 0.0,
    c: Optional[jax.Array] = None,
    transpose_a: bool = False,
    transpose_b: bool = False,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    block_k4: Optional[int] = None,
    interpret: Optional[bool] = None,
    transpose_out: bool = False,
    pipeline: bool = False,
    packed_codes: bool = False,
    row_chunks: int = 1,
    k_chunks: int = 1,
    budget_mb: "Optional[int]" = None,
) -> jax.Array:
    """Structured-sparse matmul ``decompress(s) @ b`` on the MXU.

    The matmul phase of the pipeline (`cusparseLtMatmul` on the compressed
    operand, `spmma.hxx:112-113`), as a Pallas kernel: compressed A tiles
    (half the HBM bytes of dense) are expanded in VMEM by the VPU and fed
    to the MXU, overlapped by the pipeline. Batch dims on ``s`` broadcast
    over a shared ``b`` (the reference's shared-B convention,
    `spmm.hxx:67`) by stacking along rows. Differentiable w.r.t. both the
    compressed values and ``b`` (custom VJP).

    Args:
      s: Sparse24 with logical shape ``(..., m, k)``.
      b: dense ``(k, n)`` (shared across any batch dims of ``s``).
      transpose_out: return C^T ``[n, M]`` (batch still folded in
        lanes) — the cuBLAS column-major convention the reference uses
        (ldc=m, `gemm.hxx:80`), and the k-major layout the next layer's
        compress consumes. On TPU this avoids the 128-lane padding of
        small-n outputs (n=64: 2x less C traffic). No VJP in this mode.
    """
    if transpose_a:
        # Matching cusparseLt's contract: the structured operand's 2:4
        # compression axis must be the contraction axis (k). op(A)=A^T
        # would put the sparsity on the output axis, which no structured
        # matmul (there or here) executes; decompress and use
        # `batched_gemm(transpose_a=True)` instead.
        raise NotImplementedError(
            "transpose_a is unsupported for 2:4 SpMM: the compression "
            "axis must be the contraction axis (cusparseLt has the same "
            "restriction)")
    if transpose_b:
        # Honest relayout: one XLA transpose of the dense operand (the
        # reference's opB flag is a cuSPARSE layout flag, `spmm.hxx:35`).
        b = jnp.swapaxes(b, -1, -2)
    if s.fold > 1:
        # Folded-plane operand: route to the dedicated single-k-step
        # kernel (no un-interleave anywhere in the pipeline). Row-major
        # C only (the un-fold is a free reshape there; C^T would make
        # it a transpose), and no VJP — train with fold=1 operands.
        from .kernels.spmm24_kernel import spmm24_fold_pallas

        if transpose_out:
            raise NotImplementedError(
                "transpose_out is unsupported for folded operands "
                "(the [Mf, 2n] -> [M, n] un-fold is only free in "
                "row-major C)")
        *lead, m, k = s.shape
        out = spmm24_fold_pallas(
            s.values0, s.values1, s.codes, b,
            k_logical=k,
            out_dtype=out_dtype or jnp.promote_types(s.dtype, b.dtype),
            block_m=block_m,
            interpret=interpret,
            vmem_budget_mb=budget_mb,
        )
        if alpha != 1.0 or beta != 0.0:
            out32 = out.astype(jnp.float32) * alpha
            if c is not None and beta != 0.0:
                out32 = out32 + beta * c.astype(jnp.float32).reshape(
                    -1, c.shape[-1])
            out = out32.astype(out.dtype)
        return out.reshape(*lead, m, out.shape[-1])
    *lead, m, k = s.shape
    # Planes are k-major batch-folded [k4, M]; the kernel consumes them
    # directly and the output [M, n] splits back along its leading dim
    # for free.
    if packed_codes and not pipeline:
        raise ValueError("packed_codes requires the pipelined "
                         "formulation (pipeline=True)")
    cfg = _Cfg(
        k_logical=k,
        out_dtype=out_dtype or jnp.promote_types(s.dtype, b.dtype),
        block_m=block_m,
        block_n=block_n,
        block_k4=block_k4,
        interpret=interpret,
        transpose_out=transpose_out,
        pipeline=pipeline,
        packed=packed_codes,
        row_chunks=row_chunks,
        k_chunks=k_chunks,
        budget_mb=budget_mb,
    )
    out = _spmm24_core(cfg, s.values0, s.values1, s.codes, b)
    # alpha/beta epilogue around the differentiable core: XLA fuses the
    # elementwise tail, and autodiff handles d(alpha*AB + beta*C) for
    # free. The Pallas FP kernel additionally fuses it at the store for
    # the non-differentiable plan/bench path (spmm24_pallas_fp).
    if alpha != 1.0 or beta != 0.0:
        out32 = out.astype(jnp.float32) * alpha
        if c is not None and beta != 0.0:
            c32 = c.astype(jnp.float32)
            if not transpose_out:
                # Accept C in the logical batched shape (..., m, n) or
                # already batch-folded [M, n]; the kernel output is
                # folded at this point.
                c32 = c32.reshape(-1, c32.shape[-1])
            out32 = out32 + beta * c32
        out = out32.astype(cfg.out_dtype)
    if transpose_out:
        return out
    return out.reshape(*lead, m, out.shape[-1])


def pack_codes_fp(codes: jax.Array) -> jax.Array:
    """Pack codes for KERNEL consumption: split-half layout.

    Byte ``j`` holds group ``j`` in the low nibble and group
    ``j + k4/2`` in the high nibble, so the pipelined SpMM kernel's
    unpack is one `pltpu.repeat` (tile-repeat = concatenated halves)
    plus an iota-select (`spmm24_kernel._unpack_codes_tile`). Requires
    the stored group count ``k4`` (a multiple of 16 by compress_24's
    padding) to fit a single kernel k-tile (k <= 1024 under the default
    tile picker). Distinct from :func:`pack_codes`, the adjacent-pair
    STORAGE layout.
    """
    *lead, k4, m = codes.shape
    if k4 % 2:
        raise ValueError(f"k4 {k4} must be even")
    half = k4 // 2
    lo = codes[..., :half, :]
    hi = codes[..., half:, :]
    return (lo | (hi << 4)).astype(jnp.uint8)


def pack_codes(codes: jax.Array) -> jax.Array:
    """Pack two uint8 group codes (4 bits used each) per byte.

    Pairs adjacent groups along the k-major group axis (``-2``). Storage-
    density helper (0.125 B per logical element); kernels consume the
    unpacked form, hot paths unpack once at plan-build time.
    """
    cp = _pad_to_multiple(codes, -2, 2)
    *lead, k4p, m = cp.shape
    pairs = cp.reshape(*lead, k4p // 2, 2, m)
    return (
        pairs[..., 0, :] | (pairs[..., 1, :] << 4)
    ).astype(jnp.uint8)


def unpack_codes(packed: jax.Array, k4: int) -> jax.Array:
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    codes = jnp.stack([lo, hi], axis=-2).reshape(
        *packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1]
    )
    return codes[..., :k4, :].astype(jnp.uint8)
