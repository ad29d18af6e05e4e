"""Round-5 final TPU pass: smoke gate (incl. r5 formulations) + anchor.

  smoke  — bench.smoke on the real chip -> results/tpu_smoke.log
  anchor — machine sanity anchors (dense 4096^3 bf16 TFLOP/s, HBM
           copy-add GB/s) -> results/machine_r5.json

Resumable via results/master13_state.json.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
STATE = os.path.join(REPO, "results", "master13_state.json")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from experiments import tpu_master11 as m11  # noqa: E402


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


def phase_smoke():
    from sparsifyme_tpu.bench import smoke

    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

        def flush(self):
            sys.__stdout__.flush()

    with redirect_stdout(Tee()):
        rc = smoke.main()
    with open(os.path.join(REPO, "results", "tpu_smoke.log"), "w") as f:
        f.write(buf.getvalue())
    if rc != 0:
        raise RuntimeError("smoke gate failed")
    return {"rc": rc}


def phase_anchor():
    import jax.numpy as jnp

    from sparsifyme_tpu.utils.timing import time_kernel

    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    t = time_kernel(
        lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16),
        (a, b), carrier=0, iters=16, reps=3)
    tflops = 2 * n**3 / (t.ms * 1e9)

    m = 4096
    x = jax.random.normal(jax.random.PRNGKey(2), (m, m), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(3), (m, m), jnp.float32)
    tc = time_kernel(lambda u, v: u + v, (x, y), carrier=0, iters=16,
                     reps=3)
    gbps = 3 * m * m * 4 / (tc.ms * 1e-3) / 1e9  # 2 reads + 1 write

    from sparsifyme_tpu.utils.timing import min_delta_s

    out = {
        "chip": str(jax.devices()[0]),
        "dense_4096_bf16_tflops": round(tflops, 1),
        "hbm_copy_add_gbps": round(gbps, 1),
        "min_delta_s": min_delta_s(),
        "note": "sanity anchors for the round-5 sweeps "
                "(CLAUDE.md: expect ~182-190 TFLOP/s, ~700 GB/s)",
    }
    m11.dump("results/machine_r5.json", out)
    return out


PHASES = [("smoke", phase_smoke), ("anchor", phase_anchor)]


def main(argv=None) -> int:
    only = set((argv or sys.argv[1:]))
    print(f"backend: {jax.default_backend()}", flush=True)
    for name, fn in PHASES:
        if only and name not in only:
            continue
        if name in _state() and not only:
            print(f"[skip] {name}", flush=True)
            continue
        m11.banner(f"phase {name}")
        t0 = time.time()
        try:
            info = fn() or {}
        except Exception as exc:
            import traceback

            traceback.print_exc()
            _mark(name + "_FAILED", error=str(exc)[:300])
            continue
        _mark(name, secs=round(time.time() - t0, 1),
              **{k: v for k, v in info.items()
                 if isinstance(v, (int, float, str))})
        print(f"[done] {name} in {time.time() - t0:.0f}s", flush=True)
    m11.banner("master13 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
