"""Round-5 third TPU pass: split_n sub-dot race on the n>=512 shapes.

The bn=256 tuner winners on n>=512 shapes (e.g. 196x512x2048 at
0.047 ms) are at their own DOUBLE-A-stream floor: the n-tile axis is
outermost, so every extra n-tile re-streams the packed values. The
round-5 `split_n` knob runs the same 256-wide dot geometry under a
single full-width n-tile (A streamed once). This pass races
split_n={2,4} x {block_n=full} against each committed winner on the
n>=256 shapes, updates the table only on a >=3% win, and re-runs the
paired sweep if anything changed.

Resumable via results/master14_state.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
STATE = os.path.join(REPO, "results", "master14_state.json")

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


def phase_split():
    import jax.numpy as jnp

    from sparsifyme_tpu.bench.harness import build_ell_operand
    from sparsifyme_tpu.bench.roofline import ell_sol_ms
    from sparsifyme_tpu.bench.tuning import (TABLE_PATH, load_table,
                                             save_table, shape_key)
    from sparsifyme_tpu.models.resnet_shapes import resnet_conv_shapes
    from sparsifyme_tpu.ops.ell import spmm_ell
    from sparsifyme_tpu.utils.timing import time_kernel

    def _ru(a, q):
        return -(-a // q) * q

    table = dict(load_table())
    changed = {}
    for s in sorted(set(resnet_conv_shapes("resnet50"))):
        if s.n < 256:
            continue
        kkey = shape_key(s.m, s.n, s.k, s.b)
        ent = table.get(kkey, {}).get("ell")
        if not ent or ent.get("formulation") != "gather":
            continue
        m11.banner(f"split race {kkey} (winner {ent.get('ms')} ms)")
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (s.b, s.m, s.k), jnp.bfloat16)
        bm = jax.random.normal(jax.random.PRNGKey(1), (s.k, s.n),
                               jnp.bfloat16)
        e, kp = build_ell_operand(
            a, block_size=ent["block_size"], block_k=ent["block_k"],
            fold_first=bool(ent.get("fold_first", False)))
        bp = jnp.pad(bm, ((0, kp - s.k), (0, 0)))
        floor = ell_sol_ms(s.m, s.n, s.k, s.b)
        # Re-time the committed winner in THIS process (paired compare).
        def run(extra):
            kw = dict(out_dtype=jnp.bfloat16,
                      transpose_out=ent.get("transpose_out", False),
                      block_n=extra.get("block_n", ent.get("block_n")),
                      accum_dots=ent.get("accum_dots", False),
                      gather_db=ent.get("gather_db", False),
                      block_rows_cap=ent.get("block_rows_cap"),
                      vmem_budget_mb=ent.get("budget_mb"),
                      split_n=extra.get("split_n", 1))
            try:
                return time_kernel(
                    lambda ee, y, _kw=kw: spmm_ell(ee, y, **_kw),
                    (e, bp), carrier=1, iters=8, reps=2).ms
            except Exception as exc:
                print(f"    skip ({str(exc)[:100]})", flush=True)
                return float("inf")

        base_ms = run({})
        if base_ms < 0.85 * floor:
            base_ms = run({})
        print(f"    winner re-timed: {base_ms:.4f} ms (floor "
              f"{floor:.4f})", flush=True)
        full_bn = _ru(s.n, 128)
        best_new, best_cfg = float("inf"), None
        for spl in (2, 4):
            if full_bn % spl or (full_bn // spl) % 128:
                continue
            ms = run({"split_n": spl, "block_n": full_bn})
            if 0 < ms < 0.85 * floor:
                ms = run({"split_n": spl, "block_n": full_bn})
            print(f"    split_n={spl} bn={full_bn}: {ms:.4f} ms",
                  flush=True)
            if ms < best_new:
                best_new, best_cfg = ms, {"split_n": spl,
                                          "block_n": full_bn}
        if best_cfg and best_new < 0.97 * base_ms and \
                best_new >= 0.85 * floor:
            new_ent = dict(ent, **best_cfg, ms=round(best_new, 5))
            table[kkey] = {**table[kkey], "ell": new_ent}
            changed[kkey] = {"old": base_ms, "new": best_new}
            save_table(table, TABLE_PATH)
            print(f"    -> TABLE UPDATED ({base_ms:.4f} -> "
                  f"{best_new:.4f})", flush=True)
    return {"changed": list(changed)}


def phase_sweep3():
    st = _state()
    if not (st.get("split") or {}).get("changed"):
        print("  no table changes — skipping re-sweep", flush=True)
        return {"skipped": True}
    return m11.phase_sweep()


def phase_plots():
    return m11.phase_plots()


PHASES = [("split", phase_split), ("sweep3", phase_sweep3),
          ("plots", phase_plots)]


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
        _mark(name, secs=round(time.time() - t0, 1), **info)
        print(f"[done] {name} in {time.time() - t0:.0f}s", flush=True)
    m11.banner("master14 complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
