"""Round-5 TPU master: new-formulation bring-up + full kernel round.

One process for all round-5 device work (relay discipline, CLAUDE.md):

  lower      — on-device correctness of the round-5 formulations
               (spmm24 k_chunks, folded planes end-to-end, ELL budget)
  probe24    — overlap evidence: tuned config vs k_chunks/row_chunks
               variants, expand_only/dot_only halves for the winner
               (results/overlap_probe_r5.json)
  tune24     — spmm24 full-grid re-tune, all ResNet-50 shapes
  tune_fused — fused re-tune of the narrow-k family (+fold=2) and any
               shape below 0.7 of the fused floor in round 4
  tune_ell   — ELL full-grid re-tune of the five weak shapes
               (budget/cap refinement included)
  sanitize   — drop physically impossible table entries
  coo        — config2 with the 50-99.5% crossover sweep
  sweep      — paired A/B benchmark sweep -> committed artifacts
  plots      — regenerate the results/ PNGs

Resumable via results/master11_state.json (each phase marks itself).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "results", "master11_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

PROBE_SHAPES = (  # (m, n, k, b): the round-4 overlap-probe trio
    (784, 256, 2304, 32),
    (196, 512, 2048, 32),
    (784, 256, 1024, 32),
)
ELL_WEAK = ("196x512x2048x32", "12544x64x576x32", "12544x64x147x32",
            "3136x256x512x32", "784x512x1024x32")


def _state():
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def _mark(phase, **info):
    st = _state()
    st[phase] = {"t": time.strftime("%H:%M:%S"), **info}
    with open(STATE, "w") as f:
        json.dump(st, f, indent=1, default=float)


def banner(msg):
    print(f"\n==== [{time.strftime('%H:%M:%S')}] {msg} ====", flush=True)


def dump(path, obj):
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(obj, f, indent=1, default=float)
        f.write("\n")
    print(f"  -> wrote {path}", flush=True)


def phase_lower():
    """On-device correctness of every new formulation BEFORE timing:
    interpret-mode passes do not prove Mosaic lowers them."""
    import jax.numpy as jnp
    import numpy as np

    from sparsifyme_tpu.ops.ell import ell_from_dense, spmm_ell, \
        spmm_ell_reference
    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import (compress_24,
                                             prune_compress_24, spmm_24,
                                             spmm_24_reference)

    info = {}
    key = jax.random.PRNGKey(11)
    # k_chunks on single- and multi-k-step grids
    for k, bk4 in ((256, None), (2048, 256)):
        a = jax.random.normal(key, (256, k), jnp.bfloat16)
        bm = jax.random.normal(key, (k, 128), jnp.bfloat16)
        s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        want = np.asarray(spmm_24_reference(s, bm, out_dtype=jnp.float32))
        for kc in (2, 4):
            got = np.asarray(spmm_24(
                s, bm, out_dtype=jnp.float32, pipeline=True,
                block_k4=bk4, k_chunks=kc))
            err = float(np.abs(got - want).max())
            assert err < 1e-2, f"k_chunks={kc} k={k} err={err}"
        print(f"  k_chunks k={k}: OK", flush=True)
    # folded planes end-to-end (incl. bit-identity of the selection)
    for m, k in ((512, 64), (256, 147), (512, 128)):
        a = jax.random.normal(key, (2, m, k), jnp.bfloat16)
        s1 = jax.jit(prune_compress_24)(a)
        s2 = jax.jit(lambda x: prune_compress_24(x, fold=2))(a)
        from sparsifyme_tpu.ops.sparse24 import _unfold_planes

        k4 = s1.values0.shape[0]
        rows = s1.values0.shape[1]
        for name, p1, p2 in (("v0", s1.values0, s2.values0),
                             ("v1", s1.values1, s2.values1),
                             ("codes", s1.codes, s2.codes)):
            u = np.asarray(_unfold_planes(p2, 2, k4, rows))
            if not np.array_equal(u, np.asarray(p1)):
                raise RuntimeError(f"fold=2 selection mismatch {name} "
                                   f"m={m} k={k}")
        bm = jax.random.normal(key, (k, 96), jnp.bfloat16)
        want = np.asarray(spmm_24_reference(s2, bm, out_dtype=jnp.float32))
        got = np.asarray(spmm_24(s2, bm, out_dtype=jnp.float32))
        err = float(np.abs(got - want).max())
        assert err < 1e-2, f"fold spmm m={m} k={k} err={err}"
        print(f"  fold=2 end-to-end m={m} k={k}: OK", flush=True)
    # ELL vmem budget knob
    a = jax.random.normal(key, (1024, 512), jnp.bfloat16)
    e = ell_from_dense(a, block_size=128, ell_blocks=2, block_k=128)
    bm = jax.random.normal(key, (512, 256), jnp.bfloat16)
    want = np.asarray(spmm_ell_reference(e, bm, out_dtype=jnp.float32))
    for bud in (32, 64):
        got = np.asarray(spmm_ell(e, bm, out_dtype=jnp.float32,
                                  vmem_budget_mb=bud))
        err = float(np.abs(got - want).max())
        assert err < 1e-2, f"ell budget={bud} err={err}"
    print("  ell vmem_budget_mb: OK", flush=True)
    return info


def phase_probe24():
    """Overlap evidence for the interleave formulations (VERDICT r4
    item 1's acceptance test: full ~= max(halves) means overlap)."""
    import jax.numpy as jnp

    from sparsifyme_tpu.bench.roofline import spmm24_sol_ms
    from sparsifyme_tpu.bench.tuning import lookup
    from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp
    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24
    from sparsifyme_tpu.utils.timing import time_kernel

    out = {}
    for (m, n, k, b) in PROBE_SHAPES:
        keyname = f"{m}x{n}x{k}x{b}"
        banner(f"probe24 {keyname}")
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
        bm = jax.random.normal(key, (k, n), jnp.bfloat16)
        s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        kp = 4 * s.values0.shape[0]
        bp = jnp.pad(bm, ((0, kp - k), (0, 0)))
        e = (lookup(m, n, k, b) or {}).get("spmm24") or {}
        tout = bool(e.get("transpose_out", True))
        base = dict(k_logical=k, out_dtype=jnp.bfloat16,
                    transpose_out=tout)
        sol = spmm24_sol_ms(m, n, k, b)

        def t(tag, **kw):
            try:
                ms = time_kernel(
                    lambda v0, v1, c, y, _kw=kw: spmm24_pallas_fp(
                        v0, v1, c, y, **base, **_kw),
                    (s.values0, s.values1, s.codes, bp), carrier=3,
                    iters=8, reps=2).ms
            except Exception as exc:
                print(f"    {tag}: skip ({str(exc)[:100]})", flush=True)
                return float("inf")
            print(f"    {tag}: {ms:.4f} ms (SoL {sol:.4f})", flush=True)
            return ms

        res = {"sol_ms": sol, "tout": tout}
        res["plain"] = t("plain")
        for kc in (2, 4):
            res[f"k_chunks{kc}"] = t(f"k_chunks={kc}", k_chunks=kc)
        for rc in (2, 4):
            res[f"row_chunks{rc}"] = t(f"row_chunks={rc}", row_chunks=rc)
        # probe halves for the best variant
        best_tag = min(
            (v, kk) for kk, v in res.items()
            if kk not in ("sol_ms", "tout"))[1]
        kw = {}
        if best_tag.startswith("k_chunks"):
            kw = {"k_chunks": int(best_tag[-1])}
        elif best_tag.startswith("row_chunks"):
            kw = {"row_chunks": int(best_tag[-1])}
        res["best"] = best_tag
        res["expand_only"] = t(f"{best_tag}+expand_only",
                               probe="expand_only", **kw)
        res["dot_only"] = t(f"{best_tag}+dot_only", probe="dot_only",
                            **kw)
        full = res[best_tag]
        halves_sum = res["expand_only"] + res["dot_only"]
        halves_max = max(res["expand_only"], res["dot_only"])
        res["overlap_ratio"] = (full / halves_max
                                if halves_max > 0 else None)
        res["serial_ratio"] = (full / halves_sum
                               if halves_sum > 0 else None)
        out[keyname] = res
    dump("results/overlap_probe_r5.json", out)
    return {kk: round(v.get("overlap_ratio") or -1, 3)
            for kk, v in out.items()}


def phase_tune24():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "spmm24", "--fresh", "--full", "--iters", "8",
               "--reps", "2", "--budget-s", "5400"])
    return {}


def _fused_targets():
    import csv

    targets = set()
    path = os.path.join(REPO, "results", "bench_results.csv")
    if os.path.exists(path):
        with open(path) as f:
            for r in csv.DictReader(f):
                try:
                    frac = float(r["fused_frac_sol"])
                except (KeyError, ValueError):
                    continue
                if frac == frac and frac < 0.7:
                    targets.add(f"{r['m']}x{r['n']}x{r['k']}x{r['b']}")
    from sparsifyme_tpu.models.resnet_shapes import resnet_conv_shapes

    for s in set(resnet_conv_shapes("resnet50")):
        if s.k <= 160:
            targets.add(f"{s.m}x{s.n}x{s.k}x{s.b}")
    return sorted(targets)


def phase_tune_fused():
    from sparsifyme_tpu.bench import tune

    shapes = _fused_targets()
    print(f"  fused targets: {shapes}", flush=True)
    tune.main(["--ops", "fused", "--fresh", "--iters", "6", "--reps",
               "3", "--shapes", ",".join(shapes)])
    return {"targets": len(shapes)}


def phase_tune_ell():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "ell", "--fresh", "--full", "--iters", "8",
               "--reps", "2", "--shapes", ",".join(ELL_WEAK)])
    return {"targets": len(ELL_WEAK)}


def phase_sanitize():
    from experiments.sanitize_table import flagged_entries
    from sparsifyme_tpu.bench.tuning import (TABLE_PATH, load_table,
                                             save_table)

    table = dict(load_table())
    still = [(k, op) for k, op, _, _ in flagged_entries(table)]
    for k, op in still:
        table[k] = {o: c for o, c in table[k].items() if o != op}
    if still:
        save_table(table, TABLE_PATH)
    return {"dropped": [f"{k}:{op}" for k, op in still]}


def phase_coo():
    from sparsifyme_tpu.bench.configs import config2_coo_resnet101

    res = config2_coo_resnet101(subset_stride=4)
    dump("results/config2.json", res)
    return {"crossovers": res.get("crossover_by_shape")}


def phase_sweep():
    from sparsifyme_tpu.bench.harness import run_model_sweep

    def run(tag):
        return run_model_sweep(
            "resnet50", iters=10, reps=3,
            csv_path=os.path.join(REPO, "results", "bench_results.csv")
            if tag == "A" else None,
            compare_csv_path=os.path.join(REPO, "results",
                                          "compare_tpu.csv")
            if tag == "A" else None,
            verbose=True,
        )

    resA, sumA = run("A")
    banner("sweep run B (variance check)")
    resB, sumB = run("B")
    keys = ("best_sparse_speedup_geomean", "ell_speedup_geomean",
            "spmm24_speedup_geomean", "gemm_tflops_geomean",
            "fused_frac_sol_geomean", "ell_frac_sol_geomean",
            "spmm24_frac_sol_geomean", "pair_spread_max")
    agree = {
        kk: {"A": sumA.get(kk), "B": sumB.get(kk),
             "ratio": (sumA.get(kk) / sumB.get(kk)
                       if isinstance(sumB.get(kk), float)
                       and sumB.get(kk) else None)}
        for kk in keys
    }
    dump("results/sweep_summary_r5.json", {
        "run_A": sumA, "run_B": sumB, "agreement": agree,
        "protocol": "paired dense/sparse chained loops "
                    "(utils.timing.time_kernel_pair), jitter-calibrated "
                    "delta floor, sub-SoL re-measurement AND "
                    "high-spread (>1.5x) pair retry; winners from the "
                    "round-5 re-tuned, sanitized table",
    })
    dump("results/config1.json", {
        "config": 1,
        "backend": jax.default_backend(),
        "source": "tpu_master11 sweep run A (results/bench_results.csv)",
        **{kk: vv for kk, vv in sumA.items()},
    })
    return {kk: (round(v["ratio"], 4) if v["ratio"] else None)
            for kk, v in agree.items()}


def phase_plots():
    from sparsifyme_tpu.bench.plots import (plot_compare,
                                            plot_coo_crossover,
                                            plot_speedup)

    r = os.path.join(REPO, "results")
    plot_compare(os.path.join(r, "bench_results.csv"),
                 os.path.join(r, "compare_plot.png"))
    plot_speedup(os.path.join(r, "bench_results.csv"),
                 os.path.join(r, "speedup_plot.png"))
    plot_coo_crossover(os.path.join(r, "config2.json"),
                       os.path.join(r, "coo_crossover_plot.png"))
    return {}


PHASES = [
    ("lower", phase_lower),
    ("probe24", phase_probe24),
    ("tune24", phase_tune24),
    ("tune_fused", phase_tune_fused),
    ("tune_ell", phase_tune_ell),
    ("sanitize", phase_sanitize),
    ("coo", phase_coo),
    ("sweep", phase_sweep),
    ("plots", phase_plots),
]


def main(argv=None) -> int:
    only = set((argv or sys.argv[1:]))
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    t00 = time.time()
    for name, fn in PHASES:
        if only and name not in only:
            continue
        if name in _state() and not only:
            print(f"[skip] {name} (done)", flush=True)
            continue
        banner(f"phase {name}")
        t0 = time.time()
        try:
            info = fn() or {}
        except Exception as exc:
            import traceback

            traceback.print_exc()
            _mark(name + "_FAILED", error=f"{type(exc).__name__}: "
                                          f"{str(exc)[:300]}")
            continue
        _mark(name, secs=round(time.time() - t0, 1), **info)
        print(f"[done] {name} in {time.time() - t0:.0f}s "
              f"(total {time.time() - t00:.0f}s)", flush=True)
    banner("master11 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
