"""TPU master, pass 2: smoke artifact -> deep re-tune -> sweep -> configs.

Run AFTER experiments/tpu_master.py (pass 1). Pass 1's sweep crashed on
a module-skew TypeError (the long-lived process had imported ops.ell
before the accum_dots kwarg landed); this fresh process has consistent
modules. The compilation cache from pass 1 makes everything except the
new candidate formulations nearly free.

Phases:
  1. smoke     — refresh results/tpu_smoke.log with the final kernel set
                 (incl. the accum_dots gather and packed-codes paths)
  2. tune ell  — re-race ELL on all shapes with the accum_dots candidates
  3. tune 24   — full-grid spmm24 re-race (classic + block_m overrides
                 restore the round-2 winners the trimmed grid dropped)
  4. sweep     — full ResNet-50 harness sweep -> bench_results.csv +
                 compare_tpu.csv + warm cache for the driver's bench run
  5. config1/3 — refresh against the final tuning table
"""
import os

import io
import json
import time
import traceback

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T0 = time.time()


def phase(name):
    print(f"\n===== PHASE {name} (t={time.time() - T0:.0f}s) =====",
          flush=True)


def guard(fn):
    try:
        return fn()
    except Exception:
        traceback.print_exc()
        print("phase FAILED — continuing", flush=True)
        return None


print("backend:", jax.default_backend(), jax.devices(), flush=True)

phase("smoke")


def run_smoke():
    import sys

    from sparsifyme_tpu.bench import smoke

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            return len(s)

    old = sys.stdout
    sys.stdout = Tee()
    try:
        rc = smoke.main()
    finally:
        sys.stdout = old
    os.makedirs("results", exist_ok=True)
    with open("results/tpu_smoke.log", "w") as f:
        f.write(buf.getvalue())
    print("smoke rc:", rc, flush=True)
    return rc


guard(run_smoke)

phase("tune ell (fresh, accum candidates)")


def run_tune_ell():
    from sparsifyme_tpu.bench import tune

    return tune.main(["--ops", "ell", "--fresh", "--budget-s", "1500"])


guard(run_tune_ell)

phase("tune spmm24 (full grid, fresh)")


def run_tune_24():
    from sparsifyme_tpu.bench import tune

    return tune.main(["--ops", "spmm24", "--full", "--fresh",
                      "--budget-s", "1800"])


guard(run_tune_24)

phase("sweep (resnet50 full, = bench.py workload)")


def run_sweep():
    from sparsifyme_tpu.bench.harness import run_model_sweep

    results, summary = run_model_sweep(
        "resnet50", iters=10, reps=3,
        csv_path="bench_results.csv",
        compare_csv_path="compare_tpu.csv",
        verbose=True,
    )
    print(json.dumps({k: (round(v, 4) if v == v else None)
                      for k, v in summary.items()}), flush=True)
    return summary


guard(run_sweep)

phase("config1")


def run_config1():
    from sparsifyme_tpu.bench.configs import config1_spmm24_resnet50

    r = config1_spmm24_resnet50()
    with open("results/config1.json", "w") as f:
        json.dump(r, f, default=float, indent=1)
    print("config1 saved", flush=True)


guard(run_config1)

phase("config3")


def run_config3():
    from sparsifyme_tpu.bench.configs import config3_fused_pipeline_resnet152

    r = config3_fused_pipeline_resnet152()
    with open("results/config3.json", "w") as f:
        json.dump(r, f, default=float, indent=1)
    print("config3 saved", flush=True)


guard(run_config3)

phase("config2 (COO crossover, stride-4 subset)")


def run_config2():
    from sparsifyme_tpu.bench.configs import config2_coo_resnet101

    r = config2_coo_resnet101(subset_stride=4)
    with open("results/config2.json", "w") as f:
        json.dump(r, f, default=float, indent=1)
    print("config2 saved", flush=True)


guard(run_config2)

print(f"\nALL PHASES DONE in {time.time() - T0:.0f}s", flush=True)
