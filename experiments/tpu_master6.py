"""Round-4 third TPU pass: copy-bound-ELL retune (gather_db/block_n) + final sweep.

Run AFTER experiments.tpu_master5 completes (>=10 min cooldown). The
master5 hardened sweep localized the remaining headline gap to ONE
kernel regime: ELL gather on shapes where the per-block-row B-slab
gather (a synchronous ~ellk*bn-byte VMEM copy) serializes with the dot
— measured time there is invariant to block_k/accum/transpose and sits
at 0.45-0.76 of SoL (worst: 196x512x4608, 784x512x1024). Two fixes,
both tuner-raced:

  * ``gather_db``: async double-buffered slab gather (local DMA into a
    ping-pong scratch) overlapping the MXU dot — `_kernel_db`;
  * ``block_n``: full-width B slab where the default n-tile truncates
    (kp=4608 forces bn=384 so n=512 pads to 768; n=2048 splits in two,
    re-streaming A).

Phases (resumable via results/master6_state.json):
  smoke_db  — on-device gather_db correctness vs reference oracle
  retune_bn — ELL re-tune of the 8 sub-0.85-frac-SoL shapes (--fresh)
  sweep     — paired sweep A/B; rewrites results/{bench_results.csv,
              compare_tpu.csv, sweep_summary_r4.json, config1.json}

Launch (from /root/repo):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
  PYTHONPATH=/root/repo:$PYTHONPATH \
  setsid nohup python -m experiments.tpu_master6 > logs/master6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(REPO, "results", "master6_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Every sweep shape with ELL frac-SoL < 0.85 in the master5 run-A sweep
# AND analytic headroom (SoL speedup > 1.3): the gather_db / block_n
# candidates target exactly this copy-bound regime.
BN_SHAPES = ("12544x64x147x32", "12544x64x576x32", "3136x128x1152x32",
             "3136x256x512x32", "784x512x1024x32", "196x512x4608x32",
             "196x2048x512x32", "196x512x2048x32")


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


def phase_smoke_db():
    """On-device correctness gate for the new gather_db formulation
    before any timing: async local DMA + semaphores are exactly the
    Mosaic features interpret mode cannot vouch for."""
    import jax.numpy as jnp
    import numpy as np

    from sparsifyme_tpu.bench.harness import build_ell_operand
    from sparsifyme_tpu.ops.ell import spmm_ell, spmm_ell_reference

    key = jax.random.PRNGKey(7)
    for (m, k, n, bkb) in ((196, 512, 2048, 256), (196, 4608, 512, 256),
                           (784, 1024, 512, 64)):
        a = jax.random.normal(key, (4, m, k), jnp.bfloat16)
        e, kp = build_ell_operand(a, block_size=128, block_k=bkb,
                                  fold_first=True)
        bm = jax.random.normal(key, (kp, n), jnp.bfloat16)
        want = np.asarray(spmm_ell_reference(e, bm,
                                             out_dtype=jnp.float32))
        for tout in (False, True):
            got = np.asarray(spmm_ell(e, bm, out_dtype=jnp.float32,
                                      gather_db=True,
                                      transpose_out=tout))
            if tout:
                got = got.swapaxes(-1, -2)
            err = float(np.max(np.abs(got.reshape(want.shape) - want))
                        / (np.max(np.abs(want)) + 1e-9))
            print(f"  db {m}x{k}x{n} bkb={bkb} tout={int(tout)}: "
                  f"rel-err {err:.2e}", flush=True)
            if err > 2e-2:
                raise RuntimeError(f"gather_db mismatch: {err}")
    return {}


def phase_retune_bn():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "ell", "--fresh", "--iters", "8", "--reps", "3",
               "--shapes", ",".join(BN_SHAPES)])
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
                    "tuning table incl. tuned block_n B-slabs",
    })
    dump("results/config1.json", {
        "config": 1,
        "backend": jax.default_backend(),
        "source": "tpu_master6 sweep run A (results/bench_results.csv); "
                  "paired-protocol speedups, jitter-hardened timer; SoL "
                  "columns from the committed bench.roofline model",
        **{kk: vv for kk, vv in sumA.items()},
    })
    return {kk: round(v["ratio"], 4) if v["ratio"] else None
            for kk, v in agree.items()}


PHASES = [
    ("smoke_db", phase_smoke_db),
    ("retune_bn", phase_retune_bn),
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
    banner("master6 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
