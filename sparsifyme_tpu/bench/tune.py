"""Offline kernel tuner: regenerates `tuning_table.json` on real hardware.

The `cusparseLtMatmulSearch` analog run once per machine instead of per
benchmark (`cusparseLt.h:262-277`): for every unique layer shape of a
model sweep it races the candidate kernel configurations with the same
chained-loop timer the benchmark uses (so the compiled executables land
in the persistent compilation cache that the benchmark will hit), and
writes the winners to the committed table (`bench.tuning`).

Usage::

    python -m sparsifyme_tpu.bench.tune [--model resnet50] [--ops spmm24,ell,gemm]

The table is saved incrementally after every shape, so an interrupted
run keeps its progress.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.resnet_shapes import resnet_conv_shapes
from ..ops.ell import ell_values_kmajor, spmm_ell
from ..ops.gemm import batched_gemm
from ..ops.kernels.ell_kernel import ell_expand_spmm_pallas
from ..ops.prune import prune_nm
from ..ops.sparse24 import compress_24, spmm_24
from ..utils.timing import time_kernel
from .tuning import TABLE_PATH, load_table, save_table, shape_key


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _time(fn, operands, carrier, iters, reps,
          floor_ms: Optional[float] = None) -> float:
    """Time one candidate; ``floor_ms`` is the shape's analytic
    speed-of-light (bench.roofline). A measurement below 0.85x the
    floor is physically impossible — relay-jitter contamination of the
    N/2N difference (round 4 observed winners 2-5x below their HBM
    floor poisoning the table) — so it is re-measured once and, if
    still sub-floor, DISCARDED: a candidate that cannot be timed
    credibly must not become the committed winner."""
    try:
        t = time_kernel(fn, operands, carrier=carrier, iters=iters,
                        reps=reps)
    except Exception as exc:  # infeasible tiling — skip like cusparseLt
        print(f"      skip ({type(exc).__name__}: {str(exc)[:120]})",
              flush=True)
        return float("inf")
    ms = t.ms if t.ms > 0 else float("inf")
    if floor_ms and ms < 0.85 * floor_ms:
        print(f"      below-SoL ({ms:.3f} < 0.85*{floor_ms:.3f} ms) — "
              "re-measuring", flush=True)
        try:
            t = time_kernel(fn, operands, carrier=carrier, iters=iters,
                            reps=max(reps, 3))
        except Exception:
            return float("inf")
        ms = t.ms if t.ms > 0 else float("inf")
        if ms < 0.85 * floor_ms:
            print(f"      below-SoL again ({ms:.3f} ms) — discarded",
                  flush=True)
            return float("inf")
    return ms


def spmm24_candidates(m: int, n: int, k: int,
                      full: bool = False) -> Tuple[Dict, ...]:
    """(block_m, block_n, block_k4, transpose_out, pipeline) grid.

    The default grid is the pipelined formulation in both output
    layouts — remote compiles are 30-100 s each, so every candidate
    must earn its slot (round 2's 13-variant live search blew the
    driver budget). ``full=True`` restores the classic-grid kernels
    and the block_m overrides around the heuristic's preference
    cliffs for offline deep tuning."""
    cands = [
        dict(block_m=None, block_n=None, block_k4=None,
             transpose_out=tr, pipeline=True)
        for tr in (False, True)
    ]
    if full:
        cands += [
            dict(block_m=None, block_n=None, block_k4=None,
                 transpose_out=tr, pipeline=False)
            for tr in (False, True)
        ]
        for bm in (1024, 4096):
            cands.append(dict(block_m=bm, block_n=None, block_k4=None,
                              transpose_out=True, pipeline=True))
        for tr in (False, True):
            # The heuristic's 12 MB VMEM budget is conservative (the
            # kernel's hard cap is 64 MB): fatter m-tiles halve the
            # per-step fixed costs on shapes where the picker dropped
            # to bm <= 1024.
            cands.append(dict(block_m=2048, block_n=None, block_k4=None,
                              transpose_out=tr, pipeline=True))
        cands.append(dict(block_m=1024, block_n=None, block_k4=None,
                          transpose_out=False, pipeline=True))
        cands.append(dict(block_m=512, block_n=None, block_k4=None,
                          transpose_out=True, pipeline=False))
        # Round-4 frac-SoL hypotheses (NEXT.md item 2): fine-grained
        # MXU/VPU chunk interleave within a step, and a raised VMEM
        # budget for fatter auto-picked tiles.
        for tr in (False, True):
            cands.append(dict(block_m=None, block_n=None, block_k4=None,
                              transpose_out=tr, pipeline=True,
                              row_chunks=4))
            cands.append(dict(block_m=None, block_n=None, block_k4=None,
                              transpose_out=tr, pipeline=True,
                              budget_mb=24))
        cands.append(dict(block_m=2048, block_n=None, block_k4=None,
                          transpose_out=True, pipeline=True,
                          row_chunks=8))
        # Round-5 overlap candidates: quarter-axis MXU/VPU interleave
        # (the overlap probe proved whole-slab expand/dot serialize —
        # results/overlap_probe_r4.json).
        for tr in (False, True):
            for kc in (2, 4):
                cands.append(dict(block_m=None, block_n=None,
                                  block_k4=None, transpose_out=tr,
                                  pipeline=True, k_chunks=kc))
        cands.append(dict(block_m=None, block_n=None, block_k4=None,
                          transpose_out=True, pipeline=True,
                          k_chunks=2, budget_mb=24))
    return tuple(cands)


def tune_shape(m: int, n: int, k: int, b: int, ops, *, iters: int,
               reps: int, dtype=jnp.bfloat16, full: bool = False) -> Dict:
    from .roofline import (dense_sol_ms, ell_sol_ms, fused_sol_ms,
                          spmm24_sol_ms)

    key = jax.random.PRNGKey(0)
    ka, kb2 = jax.random.split(key)
    a = jax.random.normal(ka, (b, m, k), dtype)
    bm_ = jax.random.normal(kb2, (k, n), dtype)
    entry: Dict = {}

    if "gemm" in ops:
        best, best_ms = None, float("inf")
        for fold in (True, False):
            ms = _time(
                lambda x, y, _f=fold: batched_gemm(x, y, out_dtype=dtype,
                                                   fold=_f),
                (a, bm_), 1, iters, reps,
                floor_ms=dense_sol_ms(m, n, k, b))
            print(f"    gemm fold={fold}: {ms:.3f} ms", flush=True)
            if ms < best_ms:
                best, best_ms = fold, ms
        entry["gemm"] = {"fold": best, "ms": round(best_ms, 5)}

    if "spmm24" in ops:
        s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        best, best_ms = None, float("inf")
        for cand in spmm24_candidates(m, n, k, full=full):
            ms = _time(
                lambda ss, y, _c=cand: spmm_24(ss, y, out_dtype=dtype,
                                               **_c),
                (s, bm_), 1, iters, reps,
                floor_ms=spmm24_sol_ms(m, n, k, b))
            print(f"    spmm24 {cand}: {ms:.3f} ms", flush=True)
            if ms < best_ms:
                best, best_ms = dict(cand), ms
        if k <= 1024:
            # Packed-codes pipelined kernel (A traffic 1.125 B/elem —
            # the 1.78x ceiling): single-k-step shapes only.
            from ..ops.sparse24 import pack_codes_fp
            from ..ops.kernels.spmm24_kernel import spmm24_pallas_fp

            cp = jax.jit(pack_codes_fp)(s.codes)
            kp = 4 * s.values0.shape[0]
            bp = jnp.pad(bm_, ((0, kp - k), (0, 0)))
            for tr in (False, True):
                ms = _time(
                    lambda v0, v1, c2, y, _tr=tr: spmm24_pallas_fp(
                        v0, v1, c2, y, k_logical=k, out_dtype=dtype,
                        transpose_out=_tr, packed_codes=True),
                    (s.values0, s.values1, cp, bp), 3, iters, reps,
                    floor_ms=spmm24_sol_ms(m, n, k, b, packed_codes=True))
                print(f"    spmm24 packed tout={tr}: {ms:.3f} ms",
                      flush=True)
                if ms < best_ms:
                    best = dict(packed=True, transpose_out=tr,
                                pipeline=True)
                    best_ms = ms
        if k <= 1024 and (b * m) % 2 == 0 and full:
            # Folded-plane kernel (round 5): even/odd interleaved
            # (dot, expand) pairs per tile + full-width out lanes at
            # n < 128; consumes the planes the fused fold=2 kernel
            # emits, so a win here pairs with a fused fold win.
            from ..ops.sparse24 import prune_compress_24

            sf = jax.jit(
                lambda x: prune_compress_24(x, fold=2))(a)
            ms = _time(
                lambda ss, y: spmm_24(ss, y, out_dtype=dtype),
                (sf, bm_), 1, iters, reps,
                floor_ms=spmm24_sol_ms(m, n, k, b))
            print(f"    spmm24 fold=2: {ms:.3f} ms", flush=True)
            if ms < best_ms:
                best, best_ms = dict(fold=2, pipeline=True), ms
        if best is not None:
            best["ms"] = round(best_ms, 5)
            entry["spmm24"] = best

    if "fused" in ops:
        # Fused prune+compress tiling/formulation (round-4: the odd-k /
        # small-shape fused times sat 3-4x over the HBM floor with the
        # default tiling — VERDICT r3 item 5).
        from ..ops.sparse24 import prune_compress_24

        kp64 = _round_up(k, 64)
        rows = b * m
        cands = []
        for rm in ((False, True) if dtype == jnp.bfloat16 else (False,)):
            base = dict(rank_mxu=rm)
            cands.append(base)
            if kp64 % 128:
                cands.append(dict(base, pad128=False))
            if k == 64 and (b * m) % 2 == 0:
                # Row-fold: [rows, 64] -> [rows/2, 128] outside the
                # kernel so rolls AND rank dots run at full vreg/MXU
                # width (the k=64 family sat at 0.33-0.41 of the fused
                # floor on half-width lanes; the in-kernel reshape
                # variant does not lower — Mosaic "unsupported shape
                # cast").
                cands.append(dict(base, fold_rows=True))
            if k <= 160 and (b * m) % 2 == 0:
                # END-TO-END fold (round 5): same full-width ranking as
                # fold_rows but the planes STAY folded (no compact
                # un-interleave — the cost that made fold_rows lose,
                # NEXT.md item 2); spmm24_fold_pallas consumes them.
                cands.append(dict(base, fold=2))
            if rows * k <= (1 << 23):
                # Small problems: per-grid-step fixed cost dominates —
                # try one grid step over all rows.
                cands.append(dict(base,
                                  block_rows=_round_up(rows, 128)))
        best, best_ms = None, float("inf")
        for cand in cands:
            ms = _time(
                lambda x, _c=cand: prune_compress_24(x, **_c),
                (a,), 0, iters, reps,
                floor_ms=fused_sol_ms(m, k, b) * 0.5)
            print(f"    fused {cand}: {ms:.3f} ms", flush=True)
            if ms < best_ms:
                best, best_ms = dict(cand), ms
        if best is not None:
            best["ms"] = round(best_ms, 5)
            entry["fused"] = best

    if "ell" in ops:
        from .harness import build_ell_operand

        bs = 128
        heur = 32 if k < 512 else (64 if k < 1536 else 128)
        # Heuristic k-edge plus ONE alternative (compile budget: each
        # extra bkb is 2-4 fresh remote compiles per shape; full=True
        # restores the wider offline grid). Round 4 adds WIDE edges
        # (256/512 where at least half of k stays prunable): per
        # block-row they run a few deep MXU dots instead of many
        # shallow 32-128-deep gathers — the diagnosed m=196/large-k
        # starvation fix.
        if full:
            alt = ({64} if k < 512 and k >= 128 else
                   ({32, 128} if k < 1536 else {64}))
        else:
            alt = ({64} if k < 512 and k >= 128 else
                   ({128} if k < 1536 else {64}))
        wide = {x for x in (256, 512) if 2 * x <= k}
        # Minimal-padding block edge (round 5): the weak-shape common
        # factor was k-pad waste in the packed values — k=576 at
        # bkb=128 pads kp to 768 (+33% A bytes), k=147 at bkb=64 pads
        # to 256 (+73%). Race the LARGEST edge from the extended set
        # that achieves the minimal padded row length (depth still
        # feeds the MXU reasonably).
        cand_edges = [x for x in (16, 24, 32, 48, 64, 96, 128, 192)
                      if 2 * x <= _round_up(k, 2 * x)]
        if cand_edges:
            min_len = min(_round_up(k, 2 * x) // 2 for x in cand_edges)
            nopad = max(x for x in cand_edges
                        if _round_up(k, 2 * x) // 2 == min_len)
        else:
            nopad = None
        bkbs = sorted({heur} | alt | wide | ({nopad} if nopad else set()))
        bkbs = [x for x in bkbs if 2 * x <= _round_up(k, 2 * x)]
        # fold_first (see harness.build_ell_operand): strictly less
        # padded work wherever per-sample m is not a 128-multiple but
        # the folded batch is; the per-sample layout stays as the A/B
        # reference under --full.
        can_fold = m % 128 != 0 and (m * b) % 128 == 0
        ffs = ((False, True) if (full and can_fold) else
               ((True,) if can_fold else (False,)))
        best, best_ms = None, float("inf")
        for bkb in bkbs:
            for ff in ffs:
                e, kp = build_ell_operand(a, block_size=bs, block_k=bkb,
                                          fold_first=ff)
                bp = jnp.pad(bm_, ((0, kp - k), (0, 0)))
                # Full-width B-slab candidate: the kernel's default
                # n-tile is min(n_pad, 1024, 4MB-slab cap). When that
                # truncates (large n -> A re-streamed per extra n-tile)
                # or forces a non-divisor bn (large kp -> padded C
                # work, e.g. kp=4608 caps bn at 384 so n=512 pads to
                # 768), race block_n = the full padded width as long
                # as the [kp, bn] slab stays within ~8 MB of VMEM.
                bn_default = min(_round_up(n, 128), 1024,
                                 max(128, (4 * 1024 * 1024 // (kp * 2))
                                     // 128 * 128))
                full_bn = _round_up(n, 128)
                bns = [None]
                if (n >= 128 and full_bn > bn_default
                        and kp * full_bn * 2 <= 8 * 1024 * 1024):
                    bns.append(full_bn)
                # Sub-width n-tile: A is re-streamed per extra tile but
                # every per-step tile gets the geometry of the fast
                # narrow-n siblings (the gather probe ruled the dynamic
                # slicing OUT as the fat-shape bound — geometry is the
                # remaining suspect; 784x512x1024 runs 0.046 ms at
                # n=256 and 0.147 at n=512 with identical A).
                if n >= 256:
                    half_bn = max(128, full_bn // 2)
                    if half_bn != bn_default and half_bn not in bns:
                        bns.append(half_bn)
                # accum_dots (copy-free per-slab dots) only pays at wide
                # block edges where depth-bkb dots keep the MXU busy.
                # gather_db (async double-buffered slab gather) targets
                # the copy-bound fat shapes — race it wherever the
                # per-block-row gathered bytes are significant.
                ellk_ = e.values.shape[-1]
                variants = [dict(accum_dots=a)
                            for a in ((False, True) if bkb >= 64
                                      else (False,))]
                if ellk_ * min(_round_up(n, 128), 1024) * 2 >= (1 << 16):
                    variants.append(dict(gather_db=True))
                for bn_c in bns:
                    for var in variants:
                        for tr in (False, True):
                            ms = _time(
                                lambda ee, y, _tr=tr, _v=var, _bn=bn_c:
                                spmm_ell(
                                    ee, y, out_dtype=dtype,
                                    transpose_out=_tr, block_n=_bn,
                                    **_v),
                                (e, bp), 1, iters, reps,
                                floor_ms=ell_sol_ms(m, n, k, b))
                            tag = ("db" if var.get("gather_db")
                                   else f"acc={int(var.get('accum_dots', False))}")
                            print(f"    ell gather bkb={bkb} "
                                  f"ff={int(ff)} tout={tr} "
                                  f"{tag} bn={bn_c}: "
                                  f"{ms:.3f} ms", flush=True)
                            if ms < best_ms:
                                best = dict(formulation="gather",
                                            transpose_out=tr,
                                            block_size=bs,
                                            block_k=bkb,
                                            fold_first=ff, **var)
                                if bn_c:
                                    best["block_n"] = bn_c
                                best_ms = ms
                if k <= 1024 and (full or bkb == heur):
                    vkm = jax.jit(ell_values_kmajor)(e)
                    cols = e.col_indices.reshape(
                        -1, e.col_indices.shape[-1])
                    for tr in (False, True):
                        ms = _time(
                            lambda v, y, c, _tr=tr, _bk=bkb:
                            ell_expand_spmm_pallas(
                                v, c, y, block_size=bs, block_k=_bk,
                                out_dtype=dtype, transpose_out=_tr),
                            (vkm, bp, cols), 1, iters, reps,
                            floor_ms=ell_sol_ms(m, n, k, b))
                        print(f"    ell expand bkb={bkb} ff={int(ff)} "
                              f"tout={tr}: {ms:.3f} ms", flush=True)
                        if ms < best_ms:
                            best = dict(formulation="expand",
                                        transpose_out=tr, block_size=bs,
                                        block_k=bkb, fold_first=ff)
                            best_ms = ms
        if best is not None and best.get("formulation") == "gather":
            # Winner refinement: race a capped block-row tile on the
            # winning config. Big auto-picked tiles (4 MB of values)
            # can brush the VMEM ceiling once double-buffered and the
            # pipeline silently serializes (12544x64x576 measured the
            # serial SUM of A-stream + dots + C-writes).
            e, kp = build_ell_operand(
                a, block_size=best["block_size"],
                block_k=best["block_k"],
                fold_first=best.get("fold_first", False))
            bp = jnp.pad(bm_, ((0, kp - k), (0, 0)))
            for cap in (32, 16):
                ms = _time(
                    lambda ee, y, _c=cap: spmm_ell(
                        ee, y, out_dtype=dtype,
                        transpose_out=best["transpose_out"],
                        block_n=best.get("block_n"),
                        accum_dots=best.get("accum_dots", False),
                        gather_db=best.get("gather_db", False),
                        block_rows_cap=_c),
                    (e, bp), 1, iters, reps,
                    floor_ms=ell_sol_ms(m, n, k, b))
                print(f"    ell winner+cap={cap}: {ms:.3f} ms",
                      flush=True)
                if ms < best_ms:
                    best = dict(best, block_rows_cap=cap)
                    best_ms = ms
            # Round 5: raised VMEM free-budget on the winning config
            # (the 12 MB default is a bring-up constant on a 128 MB
            # chip; fatter mblk -> fewer grid steps — the untested
            # diagnosis for the budget-invariant weak shapes).
            for bud in (32, 64):
                ms = _time(
                    lambda ee, y, _b=bud: spmm_ell(
                        ee, y, out_dtype=dtype,
                        transpose_out=best["transpose_out"],
                        block_n=best.get("block_n"),
                        accum_dots=best.get("accum_dots", False),
                        gather_db=best.get("gather_db", False),
                        block_rows_cap=best.get("block_rows_cap"),
                        vmem_budget_mb=_b),
                    (e, bp), 1, iters, reps,
                    floor_ms=ell_sol_ms(m, n, k, b))
                print(f"    ell winner+budget={bud}: {ms:.3f} ms",
                      flush=True)
                if ms < best_ms:
                    best = dict(best, budget_mb=bud)
                    best_ms = ms
            # Round 5: split_n sub-dots under a FULL-width n-tile —
            # the bn=256 winners on n>=512 shapes pay a second A
            # stream per extra n-tile; sub-dots reproduce the winning
            # dot geometry with A streamed once.
            full_bn = _round_up(n, 128)
            if n >= 256:
                for spl in (2, 4):
                    if full_bn % spl or (full_bn // spl) % 128:
                        continue
                    ms = _time(
                        lambda ee, y, _s=spl: spmm_ell(
                            ee, y, out_dtype=dtype,
                            transpose_out=best["transpose_out"],
                            block_n=full_bn,
                            accum_dots=best.get("accum_dots", False),
                            block_rows_cap=best.get("block_rows_cap"),
                            vmem_budget_mb=best.get("budget_mb"),
                            split_n=_s),
                        (e, bp), 1, iters, reps,
                        floor_ms=ell_sol_ms(m, n, k, b))
                    print(f"    ell winner+split_n={spl} bn={full_bn}: "
                          f"{ms:.3f} ms", flush=True)
                    if ms < best_ms:
                        best = dict(best, split_n=spl, block_n=full_bn)
                        best_ms = ms
        if best is not None:
            best["ms"] = round(best_ms, 5)
            entry["ell"] = best

    return entry


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--ops", default="gemm,spmm24,ell,fused")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--table", default=TABLE_PATH)
    p.add_argument("--fresh", action="store_true",
                   help="ignore existing entries (default: skip shapes "
                        "already fully tuned for the requested ops)")
    p.add_argument("--full", action="store_true",
                   help="wide candidate grid (offline deep tuning; the "
                        "default grid is sized for remote-compile cost)")
    p.add_argument("--budget-s", type=float, default=None,
                   help="wall-clock budget; stop starting new shapes "
                        "after this many seconds (table stays partial — "
                        "the harness falls back to its default search "
                        "for missing shapes)")
    p.add_argument("--shapes", default=None,
                   help="comma-separated mxnxkxb keys (e.g. "
                        "784x256x2304x32) — tune only these; for "
                        "targeted deep re-tunes of weak shapes with "
                        "--full --fresh")
    args = p.parse_args(argv)
    ops = tuple(args.ops.split(","))

    shapes = sorted(set(resnet_conv_shapes(args.model)))
    if args.shapes:
        want = set(args.shapes.split(","))
        shapes = [s for s in shapes
                  if shape_key(s.m, s.n, s.k, s.b) in want]
    table = dict(load_table(args.table))
    t0 = time.time()
    for i, s in enumerate(shapes):
        kkey = shape_key(s.m, s.n, s.k, s.b)
        have = table.get(kkey, {})
        todo = [o for o in ops if args.fresh or o not in have]
        if not todo:
            print(f"[{i + 1}/{len(shapes)}] {kkey}: already tuned",
                  flush=True)
            continue
        if args.budget_s and time.time() - t0 > args.budget_s:
            print(f"[{i + 1}/{len(shapes)}] {kkey}: SKIPPED — tune "
                  f"budget {args.budget_s:.0f}s exhausted", flush=True)
            continue
        print(f"[{i + 1}/{len(shapes)}] {kkey}: tuning {todo} "
              f"(t={time.time() - t0:.0f}s)", flush=True)
        entry = tune_shape(s.m, s.n, s.k, s.b, todo, iters=args.iters,
                           reps=args.reps, full=args.full)
        table[kkey] = {**have, **entry}
        save_table(table, args.table)  # incremental: survive timeouts
    print(f"done in {time.time() - t0:.0f}s -> {args.table}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
