"""Round-4 single-process TPU master.

ALL round-4 TPU work in ONE long-running process (CLAUDE.md relay
rules: starting a second TPU python within minutes of the first wedges
the relay claim). Phases are resumable — results/master4_state.json
records completion, and a rerun (after the mandated >=5-10 min cooldown)
skips finished phases; the persistent compilation cache makes re-entry
cheap.

Phases, in VERDICT-r3 priority order:
  config2   — the COO crossover artifact (missing two rounds running)
  anchor    — machine constants sanity (dense 4096^3 vs the 194 TFLOP/s
              roofline anchor)
  tune_ell  — round-4 ELL candidate grid: wide block_k (256/512) deep
              dots + fold_first batch packing (kills the m=196 31%
              pad), full refresh of every sweep shape
  tune_fused— fused prune+compress tiling grid (odd-k lane pad,
              block_rows) — new table family
  tune_24   — spmm24 full grid incl. row_chunks interleave + raised
              VMEM budget, weak (frac-SoL < 0.7) shapes only
  probe24   — overlap evidence: full vs expand_only vs dot_only per
              shape (results/overlap_probe_r4.json)
  sweep     — paired-protocol full sweep TWICE (variance check);
              results/bench_results.csv + results/compare_tpu.csv +
              results/sweep_summary_r4.json
  config3   — plan-pipeline artifact (warm cache)
  config1   — derived from sweep run A

Launch (from /root/repo):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  PYTHONPATH=/root/repo:$PYTHONPATH \
  setsid nohup python -m experiments.tpu_master4 > logs/master4.log 2>&1 &

configs 0 and 4 are CPU-only runners — they run in separate plain-CPU
processes and never claim the TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "results", "master4_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402


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


def _done(phase):
    return phase in _state()


def banner(msg):
    print(f"\n==== [{time.strftime('%H:%M:%S')}] {msg} ====", flush=True)


def dump(path, obj):
    with open(os.path.join(REPO, path), "w") as f:
        json.dump(obj, f, indent=1, default=float)
        f.write("\n")
    print(f"  -> wrote {path}", flush=True)


def phase_config2():
    from sparsifyme_tpu.bench.configs import config2_coo_resnet101

    res = config2_coo_resnet101(subset_stride=4)
    dump("results/config2.json", res)
    return {"points": res["points"],
            "speedup_geomean": res["speedup_vs_dense_geomean"]}


def phase_smoke():
    """TPU compile-smoke gate over every kernel formulation (incl. the
    round-4 variants) — results/tpu_smoke.log. Runs before any tuning
    so a Mosaic lowering failure surfaces immediately."""
    import contextlib

    from sparsifyme_tpu.bench import smoke

    class _Tee:
        def __init__(self, *fs):
            self.fs = fs

        def write(self, s):
            for f in self.fs:
                f.write(s)

        def flush(self):
            for f in self.fs:
                f.flush()

    smoke.FAILURES.clear()
    argv_save = sys.argv
    sys.argv = ["smoke"]  # smoke.main argparses sys.argv
    try:
        with open(os.path.join(REPO, "results", "tpu_smoke.log"),
                  "w") as f:
            with contextlib.redirect_stdout(_Tee(sys.stdout, f)):
                rc = smoke.main()
    finally:
        sys.argv = argv_save
    if rc != 0:
        raise RuntimeError(f"smoke gate: {len(smoke.FAILURES)} failures")
    return {"failures": 0}


def phase_anchor():
    from sparsifyme_tpu.bench.roofline import measure_machine
    import dataclasses

    mc = measure_machine()
    d = dataclasses.asdict(mc)
    dump("results/machine_r4.json", d)
    if mc.mxu_tflops < 150:
        print(f"  !! anchor LOW: {mc.mxu_tflops:.0f} TFLOP/s "
              "(chip in a bad state? paired protocol will defend the "
              "ratios, but absolutes are suspect)", flush=True)
    return {"mxu_tflops": mc.mxu_tflops, "hbm_gbps": mc.hbm_gbps}


def phase_tune_ell():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "ell", "--fresh", "--iters", "8", "--reps", "2"])
    return {}


def phase_tune_fused():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "fused", "--iters", "6", "--reps", "2"])
    return {}


WEAK24 = ("12544x64x147x32", "784x256x2304x32", "196x512x2048x32",
          "784x256x1024x32", "3136x256x512x32", "196x512x4608x32",
          "3136x128x1152x32", "784x512x1024x32")


def phase_tune_24():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "spmm24", "--fresh", "--full", "--iters", "8",
               "--reps", "2", "--shapes", ",".join(WEAK24)])
    return {}


def phase_probe24():
    """Overlap evidence for the pipelined kernel (VERDICT r3 missing #5):
    per-shape full / expand_only / dot_only times. full ~= max(halves)
    -> the VPU expand and MXU dot overlap; full ~= sum -> serialized."""
    from sparsifyme_tpu.bench.tuning import lookup
    from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp
    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24
    from sparsifyme_tpu.utils.timing import time_kernel

    out = {}
    for m, n, k, b in ((784, 256, 2304, 32), (196, 512, 2048, 32),
                      (784, 256, 1024, 32)):
        key = jax.random.PRNGKey(0)
        ka, kb2 = jax.random.split(key)
        a = jax.random.normal(ka, (b, m, k), jnp.bfloat16)
        bm_ = jax.random.normal(kb2, (k, n), jnp.bfloat16)
        s = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        kp = 4 * s.values0.shape[0]
        bp = jnp.pad(bm_, ((0, kp - k), (0, 0)))
        e24 = (lookup(m, n, k, b) or {}).get("spmm24") or {}
        kw = dict(k_logical=k, out_dtype=jnp.bfloat16,
                  block_m=e24.get("block_m"),
                  block_k4=e24.get("block_k4"),
                  transpose_out=e24.get("transpose_out", False),
                  row_chunks=e24.get("row_chunks", 1),
                  vmem_budget_mb=e24.get("budget_mb"))
        row = {"tuned": e24}
        for probe in (None, "expand_only", "dot_only"):
            t = time_kernel(
                lambda v0, v1, c2, y, _p=probe: spmm24_pallas_fp(
                    v0, v1, c2, y, probe=_p, **kw),
                (s.values0, s.values1, s.codes, bp), carrier=3,
                iters=8, reps=3)
            row[probe or "full"] = t.ms
            print(f"  {m}x{n}x{k} {probe or 'full'}: {t.ms:.4f} ms",
                  flush=True)
        row["overlap_ratio"] = (
            row["full"] / max(row["expand_only"], row["dot_only"])
            if row.get("expand_only", 0) > 0 else None)
        out[f"{m}x{n}x{k}x{b}"] = row
    dump("results/overlap_probe_r4.json", out)
    return {}


def _run_sweep(tag):
    from sparsifyme_tpu.bench.harness import (run_model_sweep, summarize,
                                              write_compare_csv,
                                              write_csv)

    results, summary = run_model_sweep(
        "resnet50", iters=10, reps=3,
        csv_path=os.path.join(REPO, "results", "bench_results.csv")
        if tag == "A" else None,
        compare_csv_path=os.path.join(REPO, "results", "compare_tpu.csv")
        if tag == "A" else None,
        verbose=True,
    )
    return results, summary


def phase_sweep():
    import numpy as np

    resA, sumA = _run_sweep("A")
    banner("sweep run B (variance check)")
    resB, sumB = _run_sweep("B")
    keys = ("best_sparse_speedup_geomean", "ell_speedup_geomean",
            "spmm24_speedup_geomean", "gemm_tflops_geomean")
    agree = {
        kk: {"A": sumA.get(kk), "B": sumB.get(kk),
             "ratio": (sumA.get(kk) / sumB.get(kk)
                       if sumB.get(kk) else None)}
        for kk in keys
    }
    dump("results/sweep_summary_r4.json", {
        "run_A": sumA, "run_B": sumB, "agreement": agree,
        "protocol": "paired dense/sparse chained loops "
                    "(utils.timing.time_kernel_pair), winner from the "
                    "committed tuning table",
    })
    # config1 from run A
    dump("results/config1.json", {
        "config": 1,
        "backend": jax.default_backend(),
        "source": "tpu_master4 sweep run A (results/bench_results.csv); "
                  "paired-protocol speedups; SoL columns from the "
                  "committed bench.roofline model",
        **{kk: vv for kk, vv in sumA.items()},
    })
    return {kk: round(v["ratio"], 4) if v["ratio"] else None
            for kk, v in agree.items()}


def phase_config3():
    from sparsifyme_tpu.bench.configs import config3_fused_pipeline_resnet152

    res = config3_fused_pipeline_resnet152()
    dump("results/config3.json", res)
    return {}


PHASES = [
    ("config2", phase_config2),
    ("smoke", phase_smoke),
    ("anchor", phase_anchor),
    ("tune_ell", phase_tune_ell),
    ("tune_fused", phase_tune_fused),
    ("tune_24", phase_tune_24),
    ("probe24", phase_probe24),
    ("sweep", phase_sweep),
    ("config3", phase_config3),
]


def main(argv=None) -> int:
    only = set((argv or sys.argv[1:]))
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    t00 = time.time()
    for name, fn in PHASES:
        if only and name not in only:
            continue
        if _done(name) and not only:
            print(f"[skip] {name} (done)", flush=True)
            continue
        banner(f"phase {name}")
        t0 = time.time()
        try:
            info = fn() or {}
        except Exception as exc:  # keep later phases alive
            import traceback

            traceback.print_exc()
            _mark(name + "_FAILED", error=f"{type(exc).__name__}: "
                                          f"{str(exc)[:300]}")
            continue
        _mark(name, secs=round(time.time() - t0, 1), **info)
        print(f"[done] {name} in {time.time() - t0:.0f}s "
              f"(total {time.time() - t00:.0f}s)", flush=True)
    banner("master4 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
