"""TPU compile-smoke gate: run EVERY Pallas kernel on the real chip.

Round 2 shipped a Mosaic lowering crash (k=147 fused kernel) past 175
green CPU tests — interpret-mode Pallas cannot catch Mosaic/VMEM
failures. This gate compiles and runs every kernel formulation x
transpose variant x epilogue over a shape set chosen to hit the
Mosaic-sensitive tile configurations (odd k=147/650/1920, m=196, m=1,
f32 fallbacks), checking numerics against the XLA oracles.

Run before every round-ending commit::

    PYTHONPATH=/root/repo:$PYTHONPATH python -m sparsifyme_tpu.bench.smoke \
        | tee results/tpu_smoke.log

Exit status is nonzero on any failure. (`SURVEY.md` §4: the reference's
only runtime check is `cusparseLtSpMMAPruneCheck`; this is the TPU
equivalent of that oracle check, widened to the whole kernel surface.)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def _report(name: str, ok: bool, detail: str = "") -> None:
    print(f"  {'OK  ' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def _close(name, got, want, tol) -> None:
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9))
    _report(name, err < tol, f"rel_err={err:.2e}")


def _equal(name, got, want) -> None:
    _report(name, np.array_equal(np.asarray(got, np.float32),
                                 np.asarray(want, np.float32)))


def check_24(b, m, k, n, dtype=jnp.bfloat16, tol=2e-2):
    """prune / compress / fused / spmm24 (all variants) on one shape."""
    from ..ops.prune import prune_nm
    from ..ops.sparse24 import (compress_24, prune_compress_24, spmm_24,
                                spmm_24_reference)
    from ..ops.kernels.prune_kernel import prune_compress_24_pallas

    tag = f"[{b}x{m}x{k}x{n} {jnp.dtype(dtype).name}]"
    key = jax.random.PRNGKey(hash((b, m, k, n)) % 2**31)
    a = jax.random.normal(key, (b, m, k), dtype)
    bm = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)

    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    s = jax.jit(compress_24)(pruned)
    s2 = jax.jit(prune_compress_24)(a)
    _equal(f"{tag} fused(kmajor) == compress(prune)",
           (s2.values0, s2.values1, s2.codes.astype(jnp.int32)),
           (s.values0, s.values1, s.codes.astype(jnp.int32)))
    v0, v1, codes = jax.jit(
        lambda x: prune_compress_24_pallas(x.reshape(-1, k),
                                           kmajor=False))(a)
    _equal(f"{tag} fused(rowmajor) == compress(prune)",
           (v0, v1, codes.astype(jnp.int32)),
           (s.values0, s.values1, s.codes.astype(jnp.int32)))
    if dtype == jnp.bfloat16:
        v0, v1, codes = jax.jit(
            lambda x: prune_compress_24_pallas(x.reshape(-1, k),
                                               rank_mxu=True))(a)
        _equal(f"{tag} fused(rank_mxu) == compress(prune)",
               (v0, v1, codes.astype(jnp.int32)),
               (s.values0, s.values1, s.codes.astype(jnp.int32)))

    want = spmm_24_reference(s, bm, out_dtype=jnp.float32)
    for pipe in (False, True):
        for tout in (False, True):
            got = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=pipe,
                          transpose_out=tout)
            if tout:
                got = np.asarray(got).T.reshape(want.shape)
            _close(f"{tag} spmm24 pipe={int(pipe)} tout={int(tout)}",
                   got, want, tol)
    # alpha/beta epilogue through the pipelined kernel's fused store.
    c0 = jax.random.normal(jax.random.PRNGKey(2), want.shape,
                           jnp.float32)
    got = spmm_24(s, bm, out_dtype=jnp.float32, alpha=0.5, beta=2.0,
                  c=c0, pipeline=True)
    _close(f"{tag} spmm24 alpha/beta", got, 0.5 * want + 2.0 * c0, tol)
    if dtype == jnp.bfloat16 and k <= 1024:
        # Packed-codes pipelined kernel — a tuning-table-selectable
        # production path (harness.py spmm24 branch), so the gate must
        # cover it like the plain formulations.
        from ..ops.sparse24 import pack_codes_fp
        from ..ops.kernels.spmm24_kernel import spmm24_pallas_fp

        cp = jax.jit(pack_codes_fp)(s.codes)
        kp = 4 * s.values0.shape[0]
        bp = jnp.pad(bm, ((0, kp - k), (0, 0)))
        for tout in (False, True):
            got = np.asarray(spmm24_pallas_fp(
                s.values0, s.values1, cp, bp, k_logical=k,
                out_dtype=jnp.float32, transpose_out=tout,
                packed_codes=True))
            got = (got.T if tout else got).reshape(want.shape)
            _close(f"{tag} spmm24 packed tout={int(tout)}", got, want,
                   tol)


def check_grad(b, m, k, n):
    from ..ops.prune import prune_nm
    from ..ops.sparse24 import compress_24, spmm_24

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bm = jax.random.normal(key, (k, n), jnp.bfloat16)
    s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)

    g = jax.jit(jax.grad(
        lambda y: jnp.sum(spmm_24(s, y, out_dtype=jnp.float32))))(bm)
    _report(f"[{b}x{m}x{k}x{n}] spmm24 VJP (dB) compiles+runs",
            bool(jnp.all(jnp.isfinite(g.astype(jnp.float32)))))


def check_ell(b, m, k, n, tol=2e-2):
    from ..ops.ell import (ell_from_dense, ell_values_kmajor, spmm_ell,
                           spmm_ell_reference)
    from ..ops.kernels.ell_kernel import ell_expand_spmm_pallas

    tag = f"[{b}x{m}x{k}x{n}] ell"
    bs = 128
    bkb = 32 if k < 512 else 64
    kp = -(-k // (2 * bkb)) * (2 * bkb)
    mp = -(-m // bs) * bs
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    ap = jnp.pad(a, ((0, 0), (0, mp - m), (0, kp - k)))
    bm = jax.random.normal(key, (kp, n), jnp.bfloat16)
    ell_blocks = max(1, (kp // bkb) // 2)
    e = jax.jit(lambda x: ell_from_dense(
        x, block_size=bs, ell_blocks=ell_blocks, block_k=bkb))(ap)
    want = spmm_ell_reference(e, bm, out_dtype=jnp.float32)
    for tout in (False, True):
        got = spmm_ell(e, bm, out_dtype=jnp.float32, transpose_out=tout)
        if tout:
            got = np.asarray(got).swapaxes(-1, -2).reshape(want.shape)
        _close(f"{tag} gather tout={int(tout)}", got, want, tol)
    if bkb >= 64:
        # Copy-free accumulated-dots gather (table-selectable).
        got = spmm_ell(e, bm, out_dtype=jnp.float32, accum_dots=True)
        _close(f"{tag} gather accum", got, want, tol)
    for tout in (False, True):
        # Async double-buffered slab gather. Tuner-raced only (never
        # auto-selected), and some geometries do not lower (observed
        # Mosaic 500s at bkb=512/n=64) — a compile failure here is a
        # SKIP, not a gate failure; correctness is still checked
        # wherever it does lower.
        try:
            got = spmm_ell(e, bm, out_dtype=jnp.float32, gather_db=True,
                           transpose_out=tout)
        except Exception as exc:
            print(f"  SKIP {tag} gather db tout={int(tout)} "
                  f"({type(exc).__name__}: does not lower here; "
                  "raced formulation, never auto-selected)", flush=True)
            continue
        if tout:
            got = np.asarray(got).swapaxes(-1, -2).reshape(want.shape)
        _close(f"{tag} gather db tout={int(tout)}", got, want, tol)
    vkm = jax.jit(ell_values_kmajor)(e)
    cols = e.col_indices.reshape(-1, e.col_indices.shape[-1])
    for tout in (False, True):
        got = ell_expand_spmm_pallas(
            vkm, cols, bm, block_size=bs, block_k=bkb,
            out_dtype=jnp.float32, transpose_out=tout)
        got = np.asarray(got)
        if tout:
            got = got.T
        _close(f"{tag} expand tout={int(tout)}",
               got.reshape(want.shape), want, tol)


def check_r4_variants(tol=2e-2):
    """Round-4 formulations: wide-block_k / fold-first ELL, spmm24
    row-chunk interleave + budget override + probe halves, fused
    pad128/block_rows knobs."""
    from ..bench.harness import build_ell_operand
    from ..ops.ell import spmm_ell, spmm_ell_reference
    from ..ops.prune import prune_nm
    from ..ops.sparse24 import (compress_24, prune_compress_24, spmm_24,
                                spmm_24_reference)

    key = jax.random.PRNGKey(7)
    # ELL: m*b divisible by 128 -> fold_first packs without padding.
    a = jax.random.normal(key, (4, 196, 2048), jnp.bfloat16)
    for bkb in (256, 512):
        e, kp = build_ell_operand(a, block_size=128, block_k=bkb,
                                  fold_first=True)
        bm = jax.random.normal(key, (kp, 512), jnp.bfloat16)
        want = spmm_ell_reference(e, bm, out_dtype=jnp.float32)
        for acc in (False, True):
            for tout in (False, True):
                got = np.asarray(spmm_ell(
                    e, bm, out_dtype=jnp.float32, transpose_out=tout,
                    accum_dots=acc))
                if tout:
                    got = got.T
                _close(f"[ell r4] bkb={bkb} ff acc={int(acc)} "
                       f"tout={int(tout)}", got.reshape(want.shape),
                       want, tol)
    # ELL wide-bkb single-slot (n_ell == 1, no concat at all).
    a2 = jax.random.normal(key, (4, 196, 512), jnp.bfloat16)
    e, kp = build_ell_operand(a2, block_size=128, block_k=256,
                              fold_first=True)
    bm = jax.random.normal(key, (kp, 2048), jnp.bfloat16)
    want = spmm_ell_reference(e, bm, out_dtype=jnp.float32)
    got = spmm_ell(e, bm, out_dtype=jnp.float32)
    _close("[ell r4] bkb=256 n_ell=1", np.asarray(got).reshape(
        want.shape), want, tol)

    # spmm24: row-chunk interleave, budget override, probe halves.
    a3 = jax.random.normal(key, (2, 256, 1024), jnp.bfloat16)
    b3 = jax.random.normal(key, (1024, 256), jnp.bfloat16)
    s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a3)
    want = spmm_24_reference(s, b3, out_dtype=jnp.float32)
    for rc in (2, 4):
        for tout in (False, True):
            got = np.asarray(spmm_24(
                s, b3, out_dtype=jnp.float32, pipeline=True,
                block_m=512, row_chunks=rc, transpose_out=tout))
            got = (got.T if tout else got).reshape(want.shape)
            _close(f"[24 r4] row_chunks={rc} tout={int(tout)}", got,
                   want, tol)
    got = np.asarray(spmm_24(s, b3, out_dtype=jnp.float32,
                             pipeline=True, budget_mb=24))
    _close("[24 r4] budget_mb=24", got.reshape(want.shape), want, tol)
    # probe halves just need to compile + run (outputs are not C).
    from ..ops.kernels.spmm24_kernel import spmm24_pallas_fp

    kp4 = 4 * s.values0.shape[0]
    bp = jnp.pad(b3, ((0, kp4 - 1024), (0, 0)))
    for probe in ("expand_only", "dot_only"):
        # Probe halves leave the output/scratch partially unwritten by
        # design (timing-only paths): check compile+run, not numerics.
        o = spmm24_pallas_fp(s.values0, s.values1, s.codes, bp,
                             k_logical=1024, probe=probe)
        _report(f"[24 r4] probe={probe} compiles+runs",
                np.asarray(o).shape == (512, 256))

    # fused: in-kernel lane pad with/without 128-rounding, block_rows.
    a4 = jax.random.normal(key, (2, 196, 147), jnp.bfloat16)
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a4)
    sref = jax.jit(compress_24)(pruned)
    for p128 in (True, False):
        s4 = jax.jit(lambda x, _p=p128: prune_compress_24(
            x, pad128=_p))(a4)
        _equal(f"[fused r4] k=147 pad128={int(p128)}",
               (s4.values0, s4.values1, s4.codes.astype(jnp.int32)),
               (sref.values0, sref.values1,
                sref.codes.astype(jnp.int32)))
    s4 = jax.jit(lambda x: prune_compress_24(
        x, block_rows=512))(a4)
    _equal("[fused r4] block_rows=512",
           (s4.values0, s4.values1, s4.codes.astype(jnp.int32)),
           (sref.values0, sref.values1, sref.codes.astype(jnp.int32)))
    # Row-fold (k=64 full-lane ranking; the in-kernel pack_rank reshape
    # does NOT lower on TPU — Mosaic "unsupported shape cast" — so only
    # the wrapper-level fold is smoke-gated).
    a5 = jax.random.normal(key, (2, 256, 64), jnp.bfloat16)
    sref5 = jax.jit(
        lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a5)
    s5 = jax.jit(lambda x: prune_compress_24(x, fold_rows=True))(a5)
    _equal("[fused r4] k=64 fold_rows",
           (s5.values0, s5.values1, s5.codes.astype(jnp.int32)),
           (sref5.values0, sref5.values1, sref5.codes.astype(jnp.int32)))


def check_r5_variants(tol=2e-2):
    """Round-5 formulations: spmm24 quarter-axis interleave (k_chunks),
    folded planes end-to-end (Sparse24.fold=2), odd ELL block edges
    (96/16), ELL VMEM budget override, and the ELL custom VJP."""
    from ..bench.harness import build_ell_operand
    from ..ops.ell import spmm_ell, spmm_ell_reference
    from ..ops.prune import prune_nm
    from ..ops.sparse24 import (_unfold_planes, compress_24,
                                prune_compress_24, spmm_24,
                                spmm_24_reference)

    key = jax.random.PRNGKey(9)
    # spmm24 k_chunks on single- and multi-k-step grids.
    for k, bk4 in ((1024, None), (2048, 256)):
        a = jax.random.normal(key, (2, 256, k), jnp.bfloat16)
        b3 = jax.random.normal(key, (k, 128), jnp.bfloat16)
        s24 = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        want = spmm_24_reference(s24, b3, out_dtype=jnp.float32)
        for kc in (2, 4):
            for tout in (False, True):
                got = np.asarray(spmm_24(
                    s24, b3, out_dtype=jnp.float32, pipeline=True,
                    block_k4=bk4, k_chunks=kc, transpose_out=tout))
                got = (got.T if tout else got).reshape(want.shape)
                _close(f"[24 r5] k={k} k_chunks={kc} tout={int(tout)}",
                       got, want, tol)
    # Folded planes: selection bit-identity + end-to-end matmul.
    for m, k in ((512, 64), (256, 147)):
        a = jax.random.normal(key, (2, m, k), jnp.bfloat16)
        s1 = jax.jit(prune_compress_24)(a)
        s2 = jax.jit(lambda x: prune_compress_24(x, fold=2))(a)
        k4 = s1.values0.shape[0]
        rows = s1.values0.shape[1]
        _equal(f"[fold r5] selection m={m} k={k}",
               _unfold_planes(s2.values0, 2, k4, rows), s1.values0)
        bm = jax.random.normal(key, (k, 96), jnp.bfloat16)
        want = spmm_24_reference(s2, bm, out_dtype=jnp.float32)
        got = spmm_24(s2, bm, out_dtype=jnp.float32)
        _close(f"[fold r5] spmm m={m} k={k}", np.asarray(got),
               np.asarray(want), tol)
    # Odd ELL block edges (minimal-padding candidates) + budget knob.
    for k, bkb in ((576, 96), (147, 16)):
        a = jax.random.normal(key, (2, 256, k), jnp.bfloat16)
        e, kp = build_ell_operand(a, block_size=128, block_k=bkb,
                                  fold_first=True)
        bm = jax.random.normal(key, (kp, 64), jnp.bfloat16)
        want = spmm_ell_reference(e, bm, out_dtype=jnp.float32)
        got = spmm_ell(e, bm, out_dtype=jnp.float32)
        _close(f"[ell r5] bkb={bkb} k={k}",
               np.asarray(got).reshape(want.shape), want, tol)
        got2 = spmm_ell(e, bm, out_dtype=jnp.float32, vmem_budget_mb=32)
        _close(f"[ell r5] bkb={bkb} budget=32",
               np.asarray(got2).reshape(want.shape), want, tol)
    # ELL custom VJP on-device (grad through the Pallas kernel).
    from ..containers import BlockedEll

    a = jax.random.normal(key, (512, 512), jnp.bfloat16)
    e, kp = build_ell_operand(a[None], block_size=128, block_k=128,
                              fold_first=False)
    bm = jax.random.normal(key, (kp, 128), jnp.bfloat16)

    def loss(values):
        e2 = BlockedEll(values=values, col_indices=e.col_indices,
                        shape=e.shape, block_size=e.block_size,
                        block_k=e.block_k)
        return jnp.sum(spmm_ell(e2, bm, out_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(e.values)
    _report("[ell r5] VJP grad finite",
            bool(np.isfinite(np.asarray(g, np.float32)).all()))


def check_coo(m, k, n, batch, sparsity=0.7, tol=2e-2):
    from ..ops.coo import (coo_from_dense, pack_coo, spmm_coo,
                           spmm_coo_segmented)
    from ..ops.prune import prune_threshold

    tag = f"[{m}x{k} n={n} b={batch}] coo"
    a = jax.random.normal(jax.random.PRNGKey(4), (m, k), jnp.float32)
    thr = float(np.quantile(np.abs(np.asarray(a)), sparsity))
    ap, _ = prune_threshold(a, threshold=thr)
    coo = coo_from_dense(ap)
    bm = jax.random.normal(jax.random.PRNGKey(5), (batch, k, n),
                           jnp.bfloat16)
    want = spmm_coo(coo, bm, out_dtype=jnp.float32)
    packed = pack_coo(coo)
    # "slices" is the interpret-mode A/B reference only — it does not
    # lower on real TPUs (Mosaic sublane-alignment rule; see
    # coo_kernel.spmm_coo_pallas).
    gathers = (("matmul",) if jax.default_backend() == "tpu"
               else ("matmul", "slices"))
    for gather in gathers:
        got = spmm_coo_segmented(coo, bm, out_dtype=jnp.float32,
                                 packed=packed, gather=gather)
        _close(f"{tag} segmented {gather}", got, want, tol)


def _prune_nm_numpy(w: np.ndarray, n: int, m: int) -> np.ndarray:
    """Host oracle: keep top-n of each group of m by (|v|, position),
    later positions win ties — the ranking contract shared with the C++
    native layer (CLAUDE.md architecture invariants)."""
    x = np.asarray(w, np.float32)
    k = x.shape[-1]
    kp = -(-k // m) * m
    xp = np.pad(x.reshape(-1, k), ((0, 0), (0, kp - k)))
    g = xp.reshape(-1, kp // m, m)
    order = np.lexsort((np.broadcast_to(np.arange(m), g.shape),
                        np.abs(g)), axis=-1)  # ascending (|v|, pos)
    ranks = np.argsort(order, axis=-1)
    keep = (ranks >= m - n).reshape(-1, kp)[:, :k].reshape(w.shape)
    return np.where(keep, np.asarray(w, np.float32), 0.0)


def check_prune_variants(b, m, k):
    from ..ops.kernels.prune_kernel import prune_nm_pallas

    tag = f"[{b}x{m}x{k}]"
    for dtype in (jnp.bfloat16, jnp.float32):
        a = jax.random.normal(jax.random.PRNGKey(6), (b, m, k), dtype)
        # Host-oracle ranking == Pallas ranking (key-trick path on bf16).
        want = _prune_nm_numpy(np.asarray(a, np.float32), 2, 4)
        got, _ = jax.jit(lambda x: prune_nm_pallas(x, 2, 4))(a)
        _equal(f"{tag} prune 2:4 {jnp.dtype(dtype).name} == host oracle",
               got, want)
    a = jax.random.normal(jax.random.PRNGKey(7), (b, m, k), jnp.bfloat16)
    want = _prune_nm_numpy(np.asarray(a, np.float32), 1, 4)
    got, _ = jax.jit(lambda x: prune_nm_pallas(x, 1, 4))(a)
    _equal(f"{tag} prune 1:4 == host oracle", got, want)


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (interpret-mode dry run; "
                        "never claims the TPU chip)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    if jax.default_backend() != "tpu":
        print("WARNING: not a TPU backend — this gate is only "
              "meaningful on the real chip", flush=True)

    def guard(fn, *args, **kw):
        """One crashing check (e.g. a Mosaic lowering error) must not
        abort the gate — record it as a failure and keep going, so the
        log still shows the status of every kernel."""
        import traceback

        name = f"{fn.__name__}{args}"
        try:
            fn(*args, **kw)
        except Exception:
            traceback.print_exc()
            _report(name, False, "(raised)")

    # Mosaic-sensitive shape set: odd k (147 -> kp 192 full-width tile;
    # 650 -> kp 704; 1920 hits the row-major (1216, 2048] window), tiny
    # m=1, small m=196, plus an aligned production shape.
    guard(check_24, 2, 196, 147, 64)
    guard(check_24, 1, 1, 64, 128)
    guard(check_24, 2, 128, 650, 96)
    guard(check_24, 1, 256, 1920, 128)
    guard(check_24, 4, 784, 1024, 256)
    guard(check_24, 1, 100, 148, 96, dtype=jnp.float32, tol=1e-4)
    guard(check_grad, 2, 196, 256, 64)
    guard(check_prune_variants, 2, 196, 147)
    guard(check_ell, 2, 196, 147, 64)
    guard(check_ell, 4, 784, 1024, 256)
    guard(check_r4_variants)
    guard(check_r5_variants)
    guard(check_coo, 784, 512, 64, 4)
    print(f"\n{'PASS' if not FAILURES else 'FAIL'}: "
          f"{len(FAILURES)} failures in {time.time() - t0:.0f}s",
          flush=True)
    for f in FAILURES:
        print(f"  failed: {f}", flush=True)
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
