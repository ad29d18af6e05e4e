"""Round-4 seventh TPU pass: fold_rows fused retune (k=64) + final sweep.

The in-kernel pack_rank reshape does not lower on TPU (Mosaic
"unsupported shape cast"), so the k=64 fused fix moved to the wrapper:
fold_rows reshapes [rows, 64] -> [rows/2, 128] in XLA (free), runs the
kernel at full vreg/MXU width, and un-interleaves the compact planes
(one compact-size transpose). CPU-verified bit-identical for both
ranking formulations. This pass smoke-checks it on-device, re-tunes
fused on the k=64 shapes, and reruns the paired sweep A/B (final
round-4 artifacts).

Phases (resumable via results/master10_state.json):
  smoke_fold — on-device fold_rows correctness vs two-phase oracle
  retune     — fused re-tune of the k=64 shapes (--fresh)
  sweep      — paired sweep A/B -> committed artifacts
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "results", "master10_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SHAPES = ("12544x64x64x32", "12544x256x64x32")


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


def phase_smoke_fold():
    """On-device correctness for fold_rows before timing it."""
    import jax.numpy as jnp
    import numpy as np

    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24, prune_compress_24

    key = jax.random.PRNGKey(13)
    for rm in (False, True):
        a = jax.random.normal(key, (2, 512, 64), jnp.bfloat16)
        sref = jax.jit(lambda x: compress_24(prune_nm(x, 2, 4)[0]))(a)
        s = jax.jit(lambda x, _r=rm: prune_compress_24(
            x, rank_mxu=_r, fold_rows=True))(a)
        for name, got, want in (("v0", s.values0, sref.values0),
                                ("v1", s.values1, sref.values1),
                                ("codes", s.codes, sref.codes)):
            if not np.array_equal(np.asarray(got), np.asarray(want)):
                raise RuntimeError(
                    f"fold_rows mismatch rank_mxu={rm} {name}")
        print(f"  fold_rows rank_mxu={int(rm)}: bit-identical",
              flush=True)
    return {}


def phase_retune():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "fused", "--fresh", "--iters", "6", "--reps",
               "3", "--shapes", ",".join(SHAPES)])
    from experiments.sanitize_table import flagged_entries
    from sparsifyme_tpu.bench.tuning import (TABLE_PATH, load_table,
                                             save_table)

    table = dict(load_table())
    still = [(k, op) for k, op, _, _ in flagged_entries(table)]
    for k, op in still:
        table[k] = {o: c for o, c in table[k].items() if o != op}
    if still:
        save_table(table, TABLE_PATH)
    return {"still_flagged": [f"{k}:{op}" for k, op in still]}


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
                    "(utils.timing.time_kernel_pair) with the "
                    "jitter-calibrated delta floor and sub-SoL "
                    "re-measurement guard; winners from the sanitized "
                    "tuning table (block_n + block_rows_cap refined)",
    })
    dump("results/config1.json", {
        "config": 1,
        "backend": jax.default_backend(),
        "source": "tpu_master10 sweep run A (results/bench_results.csv); "
                  "paired-protocol speedups, jitter-hardened timer; SoL "
                  "columns from the committed bench.roofline model",
        **{kk: vv for kk, vv in sumA.items()},
    })
    return {kk: round(v["ratio"], 4) if v["ratio"] else None
            for kk, v in agree.items()}


PHASES = [
    ("smoke_fold", phase_smoke_fold),
    ("retune", phase_retune),
    ("sweep", phase_sweep),
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
    banner("master10 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
