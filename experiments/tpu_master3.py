"""TPU master, pass 3 (reduced): smoke -> sweep -> config2 only.

For when the relay recovers late in the round: skips the deep re-tunes
(the committed table from pass 1 stands) and spends the remaining
budget on the artifacts that gate the round — the smoke log, the full
harness sweep (bench_results.csv/compare_tpu.csv + the compilation
cache bench.py needs), and config2.
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

phase("config2 (COO crossover, stride-4 subset)")


def run_config2():
    from sparsifyme_tpu.bench.configs import config2_coo_resnet101

    r = config2_coo_resnet101(subset_stride=4)
    with open("results/config2.json", "w") as f:
        json.dump(r, f, default=float, indent=1)
    print("config2 saved", flush=True)


guard(run_config2)

print(f"\nALL PHASES DONE in {time.time() - T0:.0f}s", flush=True)
