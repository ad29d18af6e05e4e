"""Single-process TPU master run: anchor -> smoke -> tune -> sweep -> configs.

One process holds the relay claim for the whole session (killing TPU
processes wedges the claim until a remote timeout, so phase-per-process
is fragile). Each phase is fault-isolated; the tuner saves per-shape, so
a crash loses at most one shape.

Phases:
  0. anchor    — dense 4096^3 bf16 sanity (expect ~182 TFLOP/s)
  1. smoke     — every Pallas kernel on Mosaic-sensitive shapes
                 -> results/tpu_smoke.log   (fail fast, before spending
                 the tune budget on broken kernels)
  2. tune      — per-shape algorithm search -> bench/tuning_table.json
                 (wall-budgeted; incremental saves)
  3. sweep     — full ResNet-50 harness sweep (the bench.py workload):
                 refreshes bench_results.csv + compare_tpu.csv and warms
                 the compilation cache the driver's bench run will hit
  4. config1/3 — BASELINE configs on the (now hot) cache -> results/
  5. config2   — COO crossover on a stride-4 ResNet-101 shape subset
"""
import os

import io
import json
import time
import traceback

import jax

# sitecustomize (PYTHONPATH=/root/.axon_site) imports jax BEFORE this
# script runs, so cache env vars set here are too late — use the config
# API (same as bench.py). Without the persistent cache every remote
# compile (30-100 s each) is lost on exit, and the driver's bench run
# pays them all again.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

T0 = time.time()
TUNE_BUDGET_S = float(os.environ.get("TUNE_BUDGET_S", "4800"))


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

phase("anchor (dense 4096^3 bf16)")


def run_anchor():
    import jax.numpy as jnp

    from sparsifyme_tpu.utils.timing import time_kernel

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    t = time_kernel(lambda x, y: x @ y, (a, b), carrier=1, iters=8,
                    reps=3)
    tflops = 2 * 4096**3 / (t.ms * 1e9)
    print(f"anchor: {t.ms:.3f} ms = {tflops:.1f} TFLOP/s "
          f"(sanity: ~182)", flush=True)
    return tflops


guard(run_anchor)

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

phase(f"tune (budget {TUNE_BUDGET_S:.0f}s)")


def run_tune():
    from sparsifyme_tpu.bench import tune

    return tune.main(["--budget-s", str(TUNE_BUDGET_S)])


guard(run_tune)

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
