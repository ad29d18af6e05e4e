"""Round-5 second TPU pass: overlap evidence + weak-shape refinements.

Follow-up to `tpu_master11` (same session, separate process after the
relay cooldown):

  probe24 — the overlap-evidence probe master11 skipped (carrier-kwarg
            bug, fixed): full vs expand_only/dot_only for the winning
            interleave variant per probe shape
  ell2    — ELL re-tune of the three <0.8-frac shapes with the
            minimal-padding block edge candidates (bkb=96 for k=576:
            -25% A bytes; bkb=16/24 for k=147: -37%)
  spmm24b — spmm24 re-race of the shapes whose fresh-tune entries
            regressed vs round 4 (timing noise picked a worse winner)
            plus the lowest-frac shapes
  config3 — plan-pipeline timings refreshed on the new table
  sweep2  — final paired A/B sweep -> committed artifacts + plots

Resumable via results/master12_state.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
STATE = os.path.join(REPO, "results", "master12_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from experiments import tpu_master11 as m11  # noqa: E402

ELL2 = ("196x512x2048x32", "12544x64x576x32", "12544x64x147x32")
SPMM24B = ("3136x128x1152x32", "3136x128x512x32", "784x256x1024x32",
           "784x256x2304x32", "196x512x2048x32", "12544x64x147x32")


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


def phase_probe24():
    return m11.phase_probe24()


def phase_ell2():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "ell", "--fresh", "--full", "--iters", "8",
               "--reps", "2", "--shapes", ",".join(ELL2)])
    return {}


def phase_spmm24b():
    from sparsifyme_tpu.bench import tune

    tune.main(["--ops", "spmm24", "--fresh", "--full", "--iters", "8",
               "--reps", "3", "--shapes", ",".join(SPMM24B)])
    return {}


def phase_sanitize():
    return m11.phase_sanitize()


def phase_config3():
    from sparsifyme_tpu.bench.configs import config3_fused_pipeline_resnet152

    res = config3_fused_pipeline_resnet152()
    m11.dump("results/config3.json", res)
    return {k: v for k, v in res.items() if k.endswith("geomean")}


def phase_sweep2():
    return m11.phase_sweep()


def phase_plots():
    return m11.phase_plots()


PHASES = [
    ("probe24", phase_probe24),
    ("ell2", phase_ell2),
    ("spmm24b", phase_spmm24b),
    ("sanitize", phase_sanitize),
    ("config3", phase_config3),
    ("sweep2", phase_sweep2),
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
        m11.banner(f"phase {name}")
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
    m11.banner("master12 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
