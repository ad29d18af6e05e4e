"""Single-process TPU master run: tune -> smoke -> sweep -> configs.

One process holds the relay claim for the whole session (killing TPU
processes wedges the claim until a remote timeout, so phase-per-process
is fragile). Each phase is fault-isolated; the tuner saves per-shape, so
a crash loses at most one shape.

Phases:
  1. tune      — per-shape algorithm search -> bench/tuning_table.json
  2. smoke     — every Pallas kernel on Mosaic-sensitive shapes -> results/tpu_smoke.log
  3. sweep     — full ResNet-50 harness sweep (the bench.py workload):
                 refreshes bench_results.csv + compare_tpu.csv and warms
                 the compilation cache the driver's bench run will hit
  4. config1/3 — BASELINE configs on the (now hot) cache -> results/
  5. config2   — COO crossover on a stride-2 ResNet-101 shape subset
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import contextlib
import io
import json
import time
import traceback

import jax

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

phase("tune")


def run_tune():
    from sparsifyme_tpu.bench import tune

    return tune.main([])


guard(run_tune)

phase("smoke")


def run_smoke():
    from sparsifyme_tpu.bench import smoke

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            import sys

            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            return len(s)

    import sys

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

phase("config2 (COO crossover, stride-2 subset)")


def run_config2():
    from sparsifyme_tpu.bench.configs import config2_coo_resnet101

    r = config2_coo_resnet101(subset_stride=2)
    with open("results/config2.json", "w") as f:
        json.dump(r, f, default=float, indent=1)
    print("config2 saved", flush=True)


guard(run_config2)

print(f"\nALL PHASES DONE in {time.time() - T0:.0f}s", flush=True)
