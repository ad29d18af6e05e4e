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
      still fill wide MXU tiles.
* Each grid step expands its A^T tile to quarter-major ``[4*bk4, bm]``
  with `pltpu.repeat` (tile-repeat: row ``q*bk4 + g`` holds group g) and
  two compare-selects against the repeated codes — then feeds ONE fat
  ``lax.dot_general`` (lhs contracting dim 0: the A^T weight-stationary
  orientation). A single deep MXU op per step beats four shallow
  per-quarter ops: fewer VPU accumulator adds, better MXU pipelining
  (v3 measured ~55% of the dense matmul's rate; the quarter-unrolled
  form was VPU/step-overhead bound).
* Tiles are fat on purpose: per-grid-step fixed costs dominated v3 on
  bandwidth-bound shapes (0.7 us/step at ~0.17 MB/step), so bm grows to
  2048 and bk4 up to 256 under a VMEM budget, preferring a single
  k-step (no f32 scratch accumulator at all when n_k == 1).
* B's rows are pre-permuted once by the caller into the same strided
  quarter-major order (within each k-tile, logical row ``4g+q`` moves to
  ``q*bk4 + g``), so the contraction is unchanged.
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


def _expand(v0_ref, v1_ref, codes_ref, bk4):
    """Quarter-major expanded A^T tile [4*bk4, bm] from compact planes."""
    codes = codes_ref[...].astype(jnp.int32)
    i0 = codes >> 2
    i1 = codes & 3
    v0 = v0_ref[...]
    v1 = v1_ref[...]
    zero = jnp.zeros((), v0.dtype)
    vr0 = pltpu.repeat(v0, 4, 0)
    vr1 = pltpu.repeat(v1, 4, 0)
    ir0 = pltpu.repeat(i0, 4, 0)
    ir1 = pltpu.repeat(i1, 4, 0)
    q = jax.lax.broadcasted_iota(jnp.int32, vr0.shape, 0) // bk4
    return jnp.where(ir0 == q, vr0, zero) + jnp.where(ir1 == q, vr1, zero)


def _chunked_matmul(af_parts, b_ref, bk4):
    """Partial dots per expanded chunk — independent VPU expand / MXU
    push pairs give Mosaic room to overlap the units."""
    acc = None
    for ci, af in enumerate(af_parts):
        lo = ci * af.shape[0]
        part = jax.lax.dot_general(
            af, b_ref[lo:lo + af.shape[0], :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _expand_chunks(v0_ref, v1_ref, codes_ref, bk4, chunks):
    """Expand as `chunks` independent quarter-major slabs (each covers
    4/chunks quarters of the k-tile)."""
    if chunks == 1:
        return [_expand(v0_ref, v1_ref, codes_ref, bk4)]
    codes = codes_ref[...].astype(jnp.int32)
    i0 = codes >> 2
    i1 = codes & 3
    v0 = v0_ref[...]
    v1 = v1_ref[...]
    zero = jnp.zeros((), v0.dtype)
    qper = 4 // chunks
    parts = []
    for c in range(chunks):
        vr0 = pltpu.repeat(v0, qper, 0)
        vr1 = pltpu.repeat(v1, qper, 0)
        ir0 = pltpu.repeat(i0, qper, 0)
        ir1 = pltpu.repeat(i1, qper, 0)
        q = (jax.lax.broadcasted_iota(jnp.int32, vr0.shape, 0) // bk4
             + c * qper)
        parts.append(
            jnp.where(ir0 == q, vr0, zero) + jnp.where(ir1 == q, vr1, zero)
        )
    return parts


def _dot_ct(af, b, transpose_out):
    """One MXU contraction; ``transpose_out`` emits C^T (=[bn, bm]) by
    swapping operand roles — same FLOPs, no transpose op."""
    if transpose_out:
        return jax.lax.dot_general(
            b, af, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        af, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_acc(v0_ref, v1_ref, codes_ref, b_ref, out_ref, acc_ref, *,
                n_k: int, bk4: int, chunks: int, tout: bool):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    parts = _expand_chunks(v0_ref, v1_ref, codes_ref, bk4, chunks)
    acc_ref[...] += _dot_ct(jax.lax.concatenate(parts, 0)
                            if len(parts) > 1 else parts[0],
                            b_ref[...], tout)

    @pl.when(k_idx == n_k - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _kernel_single(v0_ref, v1_ref, codes_ref, b_ref, out_ref, *,
                   bk4: int, chunks: int, tout: bool):
    parts = _expand_chunks(v0_ref, v1_ref, codes_ref, bk4, chunks)
    af = jax.lax.concatenate(parts, 0) if len(parts) > 1 else parts[0]
    out_ref[...] = _dot_ct(af, b_ref[...], tout).astype(out_ref.dtype)


def _kernel_single_cached(v0_ref, v1_ref, codes_ref, b_ref, out_ref,
                          af_ref, *, bk4: int, chunks: int, tout: bool):
    """Single k-step, several n-tiles: expand once per m-tile into VMEM
    scratch at the first n-tile, reuse it for the rest — the VPU
    decompress cost stops scaling with n."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _fill():
        parts = _expand_chunks(v0_ref, v1_ref, codes_ref, bk4, chunks)
        af_ref[...] = jax.lax.concatenate(parts, 0)

    out_ref[...] = _dot_ct(af_ref[...], b_ref[...], tout).astype(
        out_ref.dtype)


def _bm_exact(m, cap):
    """Exact divisors of the folded row count, so the m axis never pads
    (a non-dividing bm forces a full jnp.pad copy of every plane at
    call time AND pays padded FLOPs — +31% on m=196 layers). Mosaic
    requires lane-dim blocks % 128 == 0 (the planes' last dim is bm),
    so only 128-multiples qualify; bm == m exactly is exempt."""
    out = [bm for bm in range(cap - cap % 128, 127, -128) if m % bm == 0]
    if m <= cap and m % 8 == 0 and m not in out:
        out.append(m)
    return out


def _pick_bk4(k4):
    """Single k-step when it fits; otherwise the largest exact divisor
    (multiple of 16) <= 256 — compress stores k4 at a multiple of 16
    precisely so an exact divisor exists and the planes never re-pad."""
    if k4 <= 256:
        return _round_up(k4, 16)
    divs = [d for d in range(256, 15, -16) if k4 % d == 0]
    if divs:
        return divs[0]
    return min(
        range(64, 257, 16),
        key=lambda c: (_round_up(k4, c), _cdiv(k4, c)),
    )


def _pick_tiles(m, n, k4, dtype_bytes=2, vmem_budget=10 * 1024 * 1024):
    """(bm, bn, bk4): fat tiles under a VMEM budget.

    Preference order: no-padding tile edges (exact divisors) -> single
    k-step -> fat bm (amortize per-step fixed cost + deepen B reuse).
    """
    bn = min(_round_up(n, 128), 512)
    bk4 = _pick_bk4(k4)
    # m-tile: fat for small-n (per-step fixed costs dominate the
    # bandwidth-bound regime), small for big-n (measured: bm=512 beats
    # bm=2048 2x on n>=1024 shapes — better MXU pipelining).
    # n <= 64: per-step fixed costs dominate, go very fat (measured
    # 1.15x -> 1.31x on m=12544 k=64 n=64 at bm=4096); n=128 prefers
    # 2048 (4096 measured 0.93x vs 1.16x at 2048 on 3136/128/1152).
    if n <= 64:
        bm_pref = (4096, 3072, 2048, 1536, 1024, 512, 256, 128)
    elif n <= 128:
        bm_pref = (2048, 1536, 1024, 512, 256, 128)
    else:
        bm_pref = (512, 256, 128)
    # Exact divisors of m first: no plane pad-copy, no padded FLOPs.
    bm_pref = tuple(_bm_exact(m, bm_pref[0])) + bm_pref
    # VMEM per grid step (double-buffered ins/outs):
    #   planes 5*bk4*bm, B 4*bk4*bn*2, out bm*bn*2, acc bm*bn*4,
    #   expanded A^T 4*bk4*bm*2 (register/VMEM temp).
    for bm in bm_pref:
        if bm > _round_up(m, 128):
            continue
        need = (
            2 * (5 * bk4 * bm)
            + 2 * (4 * bk4 * bn * dtype_bytes)
            + 2 * (bm * bn * dtype_bytes)
            + bm * bn * 4
            + 4 * bk4 * bm * dtype_bytes
        )
        if need <= vmem_budget:
            return bm, bn, bk4
    return 128, bn, bk4


# ---------------------------------------------------------------------------
# Fully-pipelined kernel (v5): expand(t) on the VPU overlaps dot(t-1) on
# the MXU through a double-buffered VMEM slab.
# ---------------------------------------------------------------------------


def _expand_q_into(write, v0, v1, codes, quarters=(0, 1, 2, 3)):
    """Write the four quarter-major slabs of the expanded A^T tile.

    Compact-domain selects (no `pltpu.repeat`): each quarter slab
    ``[bk4, bm]`` is a select over the *compact* planes, exploiting the
    2:4 invariant ``i0 < i1`` — quarter 0 can only come from slot 0 and
    quarter 3 only from slot 1, so the expansion is 6 compares + 6
    selects + 2 adds per group instead of the tile-repeat formulation's
    ~36 VPU ops per group (measured: the repeat form serialized the VPU
    against the MXU at ~55% of dense on compute-bound shapes).

    The in-group indices are decoded once into *bf16* planes so every
    compare/select runs in the native packed bf16 layout (16, 128):
    int32-shaped masks force a sublane relayout per select (measured
    ~2.2e12 effective VPU ops/s vs the unit's ~4e12 peak).
    """
    # Decode in int16: i16 shares bf16's (16, 128) vreg tiling, so the
    # comparison masks are born in the layout the bf16 selects need —
    # an int32 decode costs a mask repack per select (measured ~2.2e12
    # effective VPU ops/s vs ~4e12 peak). Slots are disjoint (i0 < i1),
    # so quarters 1/2 nest selects instead of adding two masked terms.
    # v5e Mosaic legalizes only 32-bit vector compares (bf16 cmpf and
    # i16 cmpi both fail), so the masks are int32-shaped and each select
    # pays a mask repack into the bf16 (16, 128) layout.
    ci = codes.astype(jnp.int32)
    i0 = ci >> 2
    i1 = ci & 3
    zero = jnp.zeros((), v0.dtype)
    exprs = {
        0: lambda: jnp.where(i0 == 0, v0, zero),
        1: lambda: jnp.where(i0 == 1, v0, jnp.where(i1 == 1, v1, zero)),
        2: lambda: jnp.where(i0 == 2, v0, jnp.where(i1 == 2, v1, zero)),
        3: lambda: jnp.where(i1 == 3, v1, zero),
    }
    for q in quarters:
        write(q, exprs[q]())


def _unpack_codes_tile(cp: jax.Array) -> jax.Array:
    """In-VMEM nibble unpack: packed codes ``[bk4//2, bm]`` in the
    SPLIT-HALF layout (byte j: group j in the low nibble, group
    j + bk4/2 in the high — `ops.sparse24.pack_codes_fp`) -> int32
    codes ``[bk4, bm]``. `pltpu.repeat` is a tile-repeat (concatenated
    copies, not interleaved), which is exactly the split-half inverse:
    one repeat + one iota-select per tile. Buys 0.5 B/group of A
    traffic (the 1.6x -> 1.78x bandwidth ceiling, bench.roofline)."""
    half = cp.shape[0]
    ci = pltpu.repeat(cp.astype(jnp.int32), 2, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, ci.shape, 0)
    return jnp.where(row < half, ci & 0xF, (ci >> 4) & 0xF)


def _kernel_fp(v0_ref, v1_ref, codes_ref, b_ref, *rest,
               T: int, n_k: int, bk4: int, bm: int, tout: bool,
               alpha: float = 1.0, beta: float = 0.0,
               packed: bool = False, row_chunks: int = 1,
               k_chunks: int = 1,
               probe: "Optional[str]" = None):
    """Software-pipelined body over the flattened (m-tile, k-tile) grid.

    Step t: MXU contracts the slab expanded at step t-1 while the VPU
    expands tile t into the other slab. The two halves touch disjoint
    buffers, so Mosaic can overlap them — the overlap the single-step
    expand->dot chain structurally forbids. Buffer selection branches on
    static parity (`pl.when`) rather than a traced scratch index: a
    dynamic leading index forces Mosaic to copy the slab (measured 2x
    regression on big-k shapes).

    ``row_chunks > 1`` additionally splits BOTH halves along the m axis
    and alternates dot-chunk / expand-chunk in program order —
    explicit fine-grained MXU/VPU instruction interleaving for shapes
    where Mosaic does not overlap the two whole-slab halves (the
    round-3 probe measured per-step wall ~= serial expand+dot).
    """
    if beta != 0.0:
        c_ref, out_ref, af0_ref, af1_ref, acc_ref = rest
    else:
        c_ref = None
        out_ref, af0_ref, af1_ref, acc_ref = rest
    t = pl.program_id(0)
    parity = jax.lax.rem(t, 2)
    do_dot = probe != "expand_only"
    do_expand = probe != "dot_only"

    def oidx(cs):
        # out/acc/C-block index for an m-axis chunk slice.
        return (slice(None), cs) if tout else (cs, slice(None))

    def epilogue(part, cs):
        # alpha/beta epilogue fused at the store (`C = alpha*AB + beta*C`,
        # reference contract `spmma.hxx:22-31`): one extra VMEM read of
        # the C block, no extra HBM pass.
        if alpha != 1.0:
            part = part * jnp.float32(alpha)
        if c_ref is not None:
            part = part + jnp.float32(beta) * c_ref[oidx(cs)].astype(
                jnp.float32)
        out_ref[oidx(cs)] = part.astype(out_ref.dtype)

    def finish_part(part, cs=slice(None)):
        if n_k == 1:
            epilogue(part, cs)
        else:
            dk = jax.lax.rem(t - 1, n_k)

            @pl.when(dk == 0)
            def _init():
                acc_ref[oidx(cs)] = part

            @pl.when(dk > 0)
            def _acc():
                acc_ref[oidx(cs)] = acc_ref[oidx(cs)] + part

            @pl.when(dk == n_k - 1)
            def _store():
                epilogue(acc_ref[oidx(cs)], cs)

    def dot_from(af_ref, cs=slice(None)):
        finish_part(_dot_ct(af_ref[:, cs], b_ref[...], tout), cs)

    def expand_into(af_ref, cs=slice(None), quarters=(0, 1, 2, 3)):
        def write(q, val):
            af_ref[q * bk4:(q + 1) * bk4, cs] = val

        codes = (_unpack_codes_tile(codes_ref[:, cs]) if packed
                 else codes_ref[:, cs])
        _expand_q_into(write, v0_ref[:, cs], v1_ref[:, cs], codes,
                       quarters)

    if k_chunks > 1:
        # Quarter-axis MXU/VPU interleave (the round-5 overlap
        # candidate): the overlap probe proved the whole-slab halves
        # serialize (full ~= 0.9 * (expand_only + dot_only),
        # results/overlap_probe_r4.json), so the interior step is
        # restructured as k_chunks independent (partial-dot,
        # partial-expand) pairs along the QUARTER axis — dot chunk c
        # contracts rows [c*csz, (c+1)*csz) of the PREVIOUS slab against
        # the matching (quarter-major contiguous) B rows while the VPU
        # expands the same quarters of the CURRENT tile. Each pair
        # touches disjoint buffers and alternates MXU/VPU issue in
        # program order — finer-grained material for the scheduler than
        # the all-dot-then-all-expand form. Costs k_chunks-1 extra f32
        # adds of the out tile per step.
        qper = 4 // k_chunks
        csz = qper * bk4

        def chunk_rows(c):
            return slice(c * csz, (c + 1) * csz)

        for p, af_dot, af_exp in ((1, af0_ref, af1_ref),
                                  (0, af1_ref, af0_ref)):
            @pl.when((t > 0) & (t < T) & (parity == p))
            def _mid(af_dot=af_dot, af_exp=af_exp):
                part = None
                for c in range(k_chunks):
                    if do_dot:
                        d = _dot_ct(af_dot[chunk_rows(c), :],
                                    b_ref[chunk_rows(c), :], tout)
                        part = d if part is None else part + d
                    if do_expand:
                        expand_into(
                            af_exp,
                            quarters=tuple(range(c * qper,
                                                 (c + 1) * qper)))
                if do_dot:
                    finish_part(part)

        @pl.when(t == 0)
        def _first_k():
            if do_expand:
                expand_into(af0_ref)

        @pl.when(t == T)
        def _last_k():
            if do_dot:
                dot_from(af1_ref if T % 2 == 0 else af0_ref)
        return

    if row_chunks > 1:
        bmc = bm // row_chunks
        chunks = [slice(j * bmc, (j + 1) * bmc)
                  for j in range(row_chunks)]
        # Interior steps: alternate MXU chunk-dot (previous slab) with
        # VPU chunk-expand (current slab) — independent chains in
        # program order.
        for p, af_dot, af_exp in ((1, af0_ref, af1_ref),
                                  (0, af1_ref, af0_ref)):
            @pl.when((t > 0) & (t < T) & (parity == p))
            def _mid(af_dot=af_dot, af_exp=af_exp):
                for cs in chunks:
                    if do_dot:
                        dot_from(af_dot, cs)
                    if do_expand:
                        expand_into(af_exp, cs)

        @pl.when(t == 0)
        def _first():
            if do_expand:
                expand_into(af0_ref)

        @pl.when(t == T)
        def _last():
            if do_dot:
                dot_from(af1_ref if T % 2 == 0 else af0_ref)
        return

    # dot first (issue the MXU op), then the independent expand.
    # ``probe`` ("expand_only" / "dot_only") drops the other half for
    # overlap-evidence timing (results/ artifacts): full ~= max(halves)
    # means the units overlap; full ~= sum means they serialized.
    @pl.when((t > 0) & (parity == 1))
    def _dot0():
        if do_dot:
            dot_from(af0_ref)

    @pl.when((t > 0) & (parity == 0))
    def _dot1():
        if do_dot:
            dot_from(af1_ref)

    @pl.when((t < T) & (parity == 0))
    def _exp0():
        if do_expand:
            expand_into(af0_ref)

    @pl.when((t < T) & (parity == 1))
    def _exp1():
        if do_expand:
            expand_into(af1_ref)


def _pick_tiles_fp(m, n, k4, tout, vmem_budget=12 * 1024 * 1024):
    # NB: bm > 2048 measured 2.2-2.4x SLOWER than bm=2048 on
    # (M=100352, k=512, n=128) despite fitting VMEM — Mosaic spills /
    # loses pipelining on very large slabs. Cap at 2048; per-shape
    # tuning overrides via block_m/block_k4.
    """(bm, bk4, bnp) for the pipelined kernel: one n-tile (bnp = padded
    n), fat m-tiles to amortize per-step cost, bk4 capped at 256."""
    bnp = _round_up(n, 16 if tout else 128)
    bk4 = _pick_bk4(k4)
    n_k = _cdiv(k4, bk4)
    prefs = tuple(_bm_exact(m, 2048)) + (
        2048, 1536, 1024, 768, 512, 384, 256, 128)
    for bm in prefs:
        if bm > _round_up(m, 128):
            continue
        need = (
            2 * (5 * bk4 * bm)              # planes, double-buffered
            + 2 * (4 * bk4 * bnp * 2)       # B
            + 2 * (bm * bnp * 2)            # out
            + 2 * (4 * bk4 * bm * 2)        # af slabs
            + (bm * bnp * 4 if n_k > 1 else 0)  # acc
        )
        if need <= vmem_budget:
            return bm, bk4, bnp
    return 128, bk4, bnp


@functools.partial(
    jax.jit,
    static_argnames=("k_logical", "out_dtype", "block_m", "block_k4",
                     "interpret", "transpose_out", "alpha", "beta",
                     "packed_codes", "row_chunks", "k_chunks",
                     "vmem_budget_mb", "probe"),
)
def spmm24_pallas_fp(
    v0: jax.Array,
    v1: jax.Array,
    codes: jax.Array,
    b: jax.Array,
    c: Optional[jax.Array] = None,
    *,
    k_logical: int,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    block_k4: Optional[int] = None,
    interpret: Optional[bool] = None,
    transpose_out: bool = False,
    alpha: float = 1.0,
    beta: float = 0.0,
    packed_codes: bool = False,
    row_chunks: int = 1,
    k_chunks: int = 1,
    vmem_budget_mb: Optional[int] = None,
    probe: Optional[str] = None,
) -> jax.Array:
    """Pipelined ``C = decompress24(v0, v1, codes)[:, :k_logical] @ b``.

    Same contract as :func:`spmm24_pallas` but with a single n-tile and
    a flattened, one-step-extended (m-tile x k-tile) grid: the VPU
    expansion of tile t runs concurrently with the MXU contraction of
    tile t-1 via double-buffered VMEM slabs. This is the structural fix
    for the round-1 kernel's expand->dot serialization (SURVEY.md §7
    hard part (a)).
    """
    if interpret is None:
        interpret = default_interpret()
    k4, m = v0.shape
    k_pad_in = b.shape[0]
    n = b.shape[1]
    if k_logical > 4 * k4:
        raise ValueError(f"k_logical {k_logical} > 4*k4 {4 * k4}")

    abm, abk4, bnp = _pick_tiles_fp(
        m, n, k4, transpose_out,
        vmem_budget=(vmem_budget_mb or 12) * 1024 * 1024)
    bm = block_m or abm
    bk4 = block_k4 or abk4
    if k_chunks > 1 and row_chunks > 1:
        raise ValueError("k_chunks and row_chunks are mutually "
                         "exclusive interleave granularities")
    if row_chunks > 1 and (bm % row_chunks or
                           (bm // row_chunks) % 128):
        raise ValueError(f"row_chunks {row_chunks} must split the "
                         f"m-tile {bm} into 128-multiples")
    if k_chunks not in (1, 2, 4):
        raise ValueError(f"k_chunks {k_chunks} must be 1, 2 or 4")

    mp = _round_up(m, bm)
    np_ = _round_up(n, bnp)
    k4p = _round_up(k4, bk4)
    kp = 4 * k4p

    if packed_codes:
        if codes.shape[0] != (k4 + 1) // 2:
            raise ValueError(
                f"packed codes rows {codes.shape[0]} != k4/2 {(k4 + 1) // 2}")
        if _round_up(k4, bk4) != bk4:
            # The split-half pack pairs (g, g + k4/2) globally, which
            # only matches the kernel's per-tile unpack when the whole
            # group axis is ONE tile (k <= 1024 with the default tile
            # picker — the bandwidth-bound regime packing exists for).
            raise ValueError(
                f"packed codes require a single k-step (k4 {k4} must "
                f"fit one {bk4}-group tile)")
    if mp != m or k4p != k4:
        pad_m, pad_k4 = mp - m, k4p - k4
        v0 = jnp.pad(v0, ((0, pad_k4), (0, pad_m)))
        v1 = jnp.pad(v1, ((0, pad_k4), (0, pad_m)))
        if packed_codes:
            if pad_k4:
                raise ValueError(
                    "packed codes cannot be group-padded here — pack "
                    "with ops.sparse24.pack_codes_fp at the stored k4")
            codes = jnp.pad(codes, ((0, 0), (0, pad_m)),
                            constant_values=0x11)
        else:
            codes = jnp.pad(codes, ((0, pad_k4), (0, pad_m)),
                            constant_values=1)
    if kp != k_pad_in or np_ != n:
        b = jnp.pad(b, ((0, kp - k_pad_in), (0, np_ - n)))
    has_c = beta != 0.0
    if has_c:
        if c is None:
            raise ValueError("beta != 0 requires a C operand")
        cpad = ((0, np_ - c.shape[0]), (0, mp - c.shape[1])) \
            if transpose_out else ((0, mp - c.shape[0]), (0, np_ - c.shape[1]))
        c = jnp.pad(c, cpad)

    n_k = k4p // bk4
    n_i = mp // bm
    T = n_i * n_k

    # Quarter-major B row permutation per k-tile (row 4g+q -> q*bk4+g).
    b = b.reshape(n_k, bk4, 4, np_).swapaxes(1, 2).reshape(kp, np_)

    def planes_im(t):
        te = jnp.minimum(t, T - 1)
        return (jax.lax.rem(te, n_k), te // n_k)

    def b_im(t):
        td = jnp.maximum(t - 1, 0)
        return (jax.lax.rem(td, n_k), 0)

    def out_im(t):
        td = jnp.maximum(t - 1, 0)
        return ((0, td // n_k) if transpose_out else (td // n_k, 0))

    in_specs = [
        pl.BlockSpec((bk4, bm), planes_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((bk4, bm), planes_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((bk4 // 2 if packed_codes else bk4, bm), planes_im,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * bk4, np_), b_im, memory_space=pltpu.VMEM),
    ]
    if transpose_out:
        out_spec = pl.BlockSpec((np_, bm), out_im, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((np_, mp), out_dtype)
        acc_shape = (np_, bm)
    else:
        out_spec = pl.BlockSpec((bm, np_), out_im, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((mp, np_), out_dtype)
        acc_shape = (bm, np_)
    if has_c:
        # C blocks ride the output index map (one extra VMEM read at the
        # store; the reference epilogue contract, spmma.hxx:22-31).
        in_specs.append(pl.BlockSpec(out_spec.block_shape, out_im,
                                     memory_space=pltpu.VMEM))

    flops = 2 * m * k_logical * n
    bytes_accessed = (
        v0.size * v0.dtype.itemsize * 2
        + codes.size
        + b.size * b.dtype.itemsize
        + m * n * jnp.dtype(out_dtype).itemsize
    )
    scratch = [
        pltpu.VMEM((4 * bk4, bm), v0.dtype),
        pltpu.VMEM((4 * bk4, bm), v0.dtype),
        # acc unused when n_k == 1 (dot stores straight to out); a token
        # buffer keeps the kernel signature uniform.
        pltpu.VMEM(acc_shape if n_k > 1 else (8, 128), jnp.float32),
    ]

    operands = (v0, v1, codes, b) + ((c,) if has_c else ())
    out = pl.pallas_call(
        functools.partial(_kernel_fp, T=T, n_k=n_k, bk4=bk4, bm=bm,
                          tout=transpose_out, alpha=alpha, beta=beta,
                          packed=packed_codes, row_chunks=row_chunks,
                          k_chunks=k_chunks, probe=probe),
        grid=(T + 1,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Mosaic's default scoped-VMEM cap is 16 MB; the pipelined
            # slabs + expand temporaries run ~2x the block-spec bytes.
            # v5e has 128 MB of physical VMEM — raise the cap and let
            # the tile picker budget stay the effective limit.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)
    if transpose_out:
        return out[:n, :m]
    return out[:m, :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_logical",
        "out_dtype",
        "block_m",
        "block_n",
        "block_k4",
        "interpret",
        "transpose_out",
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
    transpose_out: bool = False,
) -> jax.Array:
    """``C[M, N] = decompress24(v0, v1, codes)[:, :k_logical] @ b``.

    ``v0/v1/codes``: k-major batch-folded planes ``[K4, M]``; ``b``:
    ``[K, N]`` shared across all folded rows (reference shared-B
    convention, `spmm.hxx:67`).

    ``transpose_out=True`` returns C^T ``[N, M]`` — the cuBLAS
    column-major convention the reference itself uses (`gemm.hxx`
    lda/ldb/ldc are column-major). On TPU this is load-bearing for
    small n: a ``[M, 64]`` output pads its lane dim to 128 (2x C write
    traffic), while ``[64, M]`` puts n in sublanes (quantum 8, no pad).
    It is also the k-major layout the *next* layer's compress consumes.
    """
    if interpret is None:
        interpret = default_interpret()
    k4, m = v0.shape
    k_pad_in = b.shape[0]  # K as stored = 4 * k4 may exceed k_logical
    n = b.shape[1]
    if k_logical > 4 * k4:
        raise ValueError(f"k_logical {k_logical} > 4*k4 {4 * k4}")

    abm, abn, abk4 = _pick_tiles(m, n, k4)
    bm = block_m or abm
    bn = block_n or abn
    bk4 = block_k4 or abk4
    if transpose_out and block_n is None:
        # C^T puts n in sublanes: tile it at the 8-row quantum instead
        # of 128 lanes — for n=64 this halves the C write traffic.
        bn = min(_round_up(n, 8), 512)

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

    in_specs = [
        pl.BlockSpec((bk4, bm), lambda i, j, kk: (kk, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk4, bm), lambda i, j, kk: (kk, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk4, bm), lambda i, j, kk: (kk, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * bk4, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
    ]
    if transpose_out:
        out_spec = pl.BlockSpec((bn, bm), lambda i, j, kk: (j, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((np_, mp), out_dtype)
        acc_shape = (bn, bm)
    else:
        out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((mp, np_), out_dtype)
        acc_shape = (bm, bn)
    common = dict(
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )
    chunks = 1  # measured: 2-chunk overlap regressed (0.94x -> 0.83x)
    if n_k == 1 and np_ // bn > 1:
        # Scratch reuse needs the n axis sequential (j scans within a
        # fixed m-tile; the expand fills at j == 0).
        common["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_single_cached, bk4=bk4,
                              chunks=chunks, tout=transpose_out),
            scratch_shapes=[pltpu.VMEM((4 * bk4, bm), v0.dtype)],
            **common,
        )(v0, v1, codes, b)
    elif n_k == 1:
        out = pl.pallas_call(
            functools.partial(_kernel_single, bk4=bk4, chunks=chunks,
                              tout=transpose_out),
            **common,
        )(v0, v1, codes, b)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_acc, n_k=n_k, bk4=bk4,
                              chunks=chunks, tout=transpose_out),
            scratch_shapes=[pltpu.VMEM(acc_shape, jnp.float32)],
            **common,
        )(v0, v1, codes, b)
    if transpose_out:
        return out[:n, :m]
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Folded-plane kernel (round 5): consume planes in the f=2 row-folded
# layout the fused prune+compress kernel emits for narrow-k layers —
# no un-interleave transpose is ever paid (NEXT.md r4 item 2).
# ---------------------------------------------------------------------------


def _kernel_fp_fold(v0_ref, v1_ref, codes_ref, b_ref, out_ref,
                    af0e_ref, af0o_ref, af1e_ref, af1o_ref, *,
                    T: int, bk4: int, tout_n: int):
    """Pipelined folded-plane body: single k-step, fold = 2.

    Plane blocks are ``[2*bk4, bm]``: rows ``[0, bk4)`` hold the groups
    of EVEN original rows (original row ``2j`` lives in folded lane
    ``j``), rows ``[bk4, 2*bk4)`` the odd rows — exactly what the fused
    kernel produces from the free ``[rows, k] -> [rows/2, 2k]``
    row-major reshape. Each interior step runs TWO independent
    (dot, expand) pairs — even and odd halves — alternating MXU and VPU
    issue in program order against ping-pong slab pairs; the out tile
    is ``[bm, 2*n]`` with the even product in lanes ``[0, n)`` and the
    odd in ``[n, 2n)``, so the caller's ``[mp/2, 2n] -> [mp, n]``
    reshape (free, row-major) restores row order.

    A side benefit on n < 128 layers: the ``2n``-wide out tile needs no
    128-lane padding at n = 64, halving C write traffic without the
    C^T layout.
    """
    t = pl.program_id(0)
    parity = jax.lax.rem(t, 2)
    np_ = tout_n

    def expand_half(af_ref, h):
        def write(q, val):
            af_ref[q * bk4:(q + 1) * bk4, :] = val

        _expand_q_into(
            write,
            v0_ref[h * bk4:(h + 1) * bk4, :],
            v1_ref[h * bk4:(h + 1) * bk4, :],
            codes_ref[h * bk4:(h + 1) * bk4, :],
        )

    def dot_half(af_ref, h):
        part = jax.lax.dot_general(
            af_ref[...], b_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[:, h * np_:(h + 1) * np_] = part.astype(out_ref.dtype)

    for p, (de, do), (ee, eo) in (
            (1, (af0e_ref, af0o_ref), (af1e_ref, af1o_ref)),
            (0, (af1e_ref, af1o_ref), (af0e_ref, af0o_ref))):
        @pl.when((t > 0) & (t < T) & (parity == p))
        def _mid(de=de, do=do, ee=ee, eo=eo):
            # Interleaved program order: even dot / even expand /
            # odd dot / odd expand — four mutually independent units of
            # work per step.
            dot_half(de, 0)
            expand_half(ee, 0)
            dot_half(do, 1)
            expand_half(eo, 1)

    @pl.when(t == 0)
    def _first():
        expand_half(af0e_ref, 0)
        expand_half(af0o_ref, 1)

    @pl.when(t == T)
    def _last():
        de, do = ((af1e_ref, af1o_ref) if T % 2 == 0
                  else (af0e_ref, af0o_ref))
        dot_half(de, 0)
        dot_half(do, 1)


@functools.partial(
    jax.jit,
    static_argnames=("k_logical", "out_dtype", "block_m", "interpret",
                     "vmem_budget_mb"),
)
def spmm24_fold_pallas(
    v0: jax.Array,       # [2*k4, Mf]  (fold = 2, Mf = M/2)
    v1: jax.Array,
    codes: jax.Array,
    b: jax.Array,        # [k, n]
    *,
    k_logical: int,
    out_dtype=jnp.bfloat16,
    block_m: Optional[int] = None,
    interpret: Optional[bool] = None,
    vmem_budget_mb: Optional[int] = None,
) -> jax.Array:
    """``C[M, n] = decompress24_folded(v0, v1, codes) @ b`` for planes in
    the f=2 row-folded layout.

    The fused prune+compress kernel for narrow k (k <= ~147) ranks at
    full vreg width only on the folded ``[rows/2, 2k]`` view; round 4
    proved the un-interleave back to standard planes costs more than
    the full-lane win (1.45 ms vs 0.40 on 12544x64, NEXT.md item 2).
    This kernel consumes the folded planes directly — the transpose is
    never paid anywhere in the pipeline. Single k-step only (folded
    use lives at k <= 1024); row-major C (the [Mf, 2n] -> [M, n]
    un-fold is a free reshape; C^T would make it a real transpose).
    Matches the matmul phase contract of `spmma.hxx:112-113`.
    """
    if interpret is None:
        interpret = default_interpret()
    fk4, mf = v0.shape
    if fk4 % 2:
        raise ValueError(f"folded planes need even row count, got {fk4}")
    k4 = fk4 // 2
    if k_logical > 4 * k4:
        raise ValueError(f"k_logical {k_logical} > 4*k4 {4 * k4}")
    if k4 > 256:
        raise ValueError(
            f"fold=2 requires a single k-step (k4 {k4} <= 256)")
    bk4 = k4  # one k-tile per half by construction (k4 multiple of 16)
    k_pad_in, n = b.shape
    np_ = _round_up(n, 64)  # out lane width is 2*np_ (>= 128)

    budget = (vmem_budget_mb or 12) * 1024 * 1024
    prefs = tuple(_bm_exact(mf, 2048)) + (
        2048, 1536, 1024, 768, 512, 384, 256, 128)
    abm = 128
    for bm_c in prefs:
        if bm_c > _round_up(mf, 128):
            continue
        need = (
            2 * (5 * fk4 * bm_c)            # planes, double-buffered
            + 2 * (4 * bk4 * np_ * 2)       # B (single tile)
            + 2 * (bm_c * 2 * np_ * 2)      # out
            + 4 * (4 * bk4 * bm_c * 2)      # 4 af slabs
        )
        if need <= budget:
            abm = bm_c
            break
    bm = block_m or abm

    mp = _round_up(mf, bm)
    kp = 4 * bk4
    if mp != mf:
        pad = mp - mf
        v0 = jnp.pad(v0, ((0, 0), (0, pad)))
        v1 = jnp.pad(v1, ((0, 0), (0, pad)))
        codes = jnp.pad(codes, ((0, 0), (0, pad)), constant_values=1)
    if kp != k_pad_in or np_ != n:
        b = jnp.pad(b, ((0, kp - k_pad_in), (0, np_ - n)))

    # Quarter-major permutation of the single B k-tile (row 4g+q ->
    # q*bk4+g) — same contraction the unfolded pipelined kernel uses.
    b = b.reshape(bk4, 4, np_).swapaxes(0, 1).reshape(kp, np_)

    T = mp // bm

    def planes_im(t):
        return (0, jnp.minimum(t, T - 1))

    def out_im(t):
        return (jnp.maximum(t - 1, 0), 0)

    in_specs = [
        pl.BlockSpec((fk4, bm), planes_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((fk4, bm), planes_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((fk4, bm), planes_im, memory_space=pltpu.VMEM),
        pl.BlockSpec((kp, np_), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((bm, 2 * np_), out_im,
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((mp, 2 * np_), out_dtype)

    m_total = 2 * mf
    flops = 2 * m_total * k_logical * n
    bytes_accessed = (
        v0.size * v0.dtype.itemsize * 2
        + codes.size
        + b.size * b.dtype.itemsize
        + m_total * n * jnp.dtype(out_dtype).itemsize
    )
    scratch = [pltpu.VMEM((4 * bk4, bm), v0.dtype) for _ in range(4)]

    out = pl.pallas_call(
        functools.partial(_kernel_fp_fold, T=T, bk4=bk4, tout_n=np_),
        grid=(T + 1,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(v0, v1, codes, b)
    # Un-fold: [mp, 2*np_] -> rows (2j, 2j+1) interleave — free reshape
    # when np_ == n, else slice each half first.
    outm = out[:mf]
    if np_ != n:
        outm = jnp.concatenate(
            [outm[:, :n], outm[:, np_:np_ + n]], axis=1)
    return outm.reshape(2 * mf, n)
