"""Round-4 follow-up TPU master: hardened re-measurement pass.

Run AFTER experiments.tpu_master4 completes (>=10 min cooldown, CLAUDE.md
relay rules). master4's tune pass ran with the 8 ms minimum N/2N delta,
which sits INSIDE the relay's round-trip jitter amplitude: a network
spike on the middle sync subtracts from the delta, and five committed
winners landed 0.2-0.8x BELOW their analytic speed-of-light
(experiments.sanitize_table). This pass re-measures with the fixes:

  * utils.timing.min_delta_s(): jitter-calibrated >=40 ms delta floor
  * bench.tune._time(): sub-SoL candidates re-measured then discarded
  * bench.harness: sub-SoL paired measurements re-taken once

Phases (resumable via results/master5_state.json):
  jitter    — record the calibrated delta floor + rtt spread
  sanitize  — drop sub-floor winners from the tuning table (in-process)
  retune    — re-tune exactly the dropped (shape, op) pairs
  sweep     — paired-protocol full sweep TWICE; rewrites
              results/{bench_results.csv, compare_tpu.csv,
              sweep_summary_r4.json, config1.json}
  leftovers — probe24/config3 if master4 marked them FAILED

Launch (from /root/repo):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  PYTHONPATH=/root/repo:$PYTHONPATH \
  setsid nohup python -m experiments.tpu_master5 > logs/master5.log 2>&1 &
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "results", "master5_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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


def phase_jitter():
    import jax.numpy as jnp

    from sparsifyme_tpu.utils import timing

    x = jnp.zeros((8,), jnp.float32)
    timing.sync(x)
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        timing.sync(x)
        rtts.append(time.perf_counter() - t0)
    rtts.sort()
    md = timing.min_delta_s()
    dump("results/jitter_r4.json", {
        "rtt_ms": [round(r * 1e3, 3) for r in rtts],
        "rtt_median_ms": round(rtts[len(rtts) // 2] * 1e3, 3),
        "rtt_spread_ms": round((rtts[-1] - rtts[0]) * 1e3, 3),
        "min_delta_ms": round(md * 1e3, 3),
        "note": "min_delta_s is the smallest N/2N wall difference the "
                "timer accepts; it must dwarf the sync round-trip "
                "spread or a spike on the middle sync fabricates "
                "below-speed-of-light readings",
    })
    return {"min_delta_ms": round(md * 1e3, 3)}


def phase_sanitize():
    from experiments.sanitize_table import flagged_entries
    from sparsifyme_tpu.bench.tuning import (TABLE_PATH, load_table,
                                             save_table)

    table = dict(load_table())
    by_op = collections.defaultdict(list)
    for key, op, ms, fl in flagged_entries(table):
        print(f"  drop {key} {op}: {ms:.5f} ms < 0.85*{fl:.5f}",
              flush=True)
        by_op[op].append(key)
        table[key] = {o: c for o, c in table[key].items() if o != op}
    save_table(table, TABLE_PATH)
    return {"dropped": {op: keys for op, keys in by_op.items()}}


def phase_retune():
    from sparsifyme_tpu.bench import tune

    dropped = _state().get("sanitize", {}).get("dropped", {})
    for op, keys in sorted(dropped.items()):
        banner(f"retune {op}: {keys}")
        tune.main(["--ops", op, "--iters", "8", "--reps", "3",
                   "--shapes", ",".join(keys)])
    # Post-check: anything still sub-floor stays dropped (harness falls
    # back to its live best-of search for missing entries).
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
                    "tuning table",
    })
    dump("results/config1.json", {
        "config": 1,
        "backend": jax.default_backend(),
        "source": "tpu_master5 sweep run A (results/bench_results.csv); "
                  "paired-protocol speedups, jitter-hardened timer; SoL "
                  "columns from the committed bench.roofline model",
        **{kk: vv for kk, vv in sumA.items()},
    })
    return {kk: round(v["ratio"], 4) if v["ratio"] else None
            for kk, v in agree.items()}


def phase_leftovers():
    m4 = {}
    p4 = os.path.join(REPO, "results", "master4_state.json")
    if os.path.exists(p4):
        with open(p4) as f:
            m4 = json.load(f)
    ran = []
    from experiments import tpu_master4 as m4mod

    for name in ("probe24", "config3"):
        if name not in m4:
            banner(f"leftover master4 phase: {name}")
            try:
                getattr(m4mod, f"phase_{name}")()
                ran.append(name)
            except Exception:
                import traceback

                traceback.print_exc()
    return {"ran": ran}


PHASES = [
    ("jitter", phase_jitter),
    ("sanitize", phase_sanitize),
    ("retune", phase_retune),
    ("sweep", phase_sweep),
    ("leftovers", phase_leftovers),
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
        except Exception as exc:
            import traceback

            traceback.print_exc()
            _mark(name + "_FAILED", error=f"{type(exc).__name__}: "
                                          f"{str(exc)[:300]}")
            continue
        _mark(name, secs=round(time.time() - t0, 1), **info)
        print(f"[done] {name} in {time.time() - t0:.0f}s "
              f"(total {time.time() - t00:.0f}s)", flush=True)
    banner("master5 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
