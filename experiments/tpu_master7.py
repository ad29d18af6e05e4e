"""Round-4 fourth TPU pass: isolate the ELL dynamic-gather cost.

Probe for the one remaining undiagnosed regime: 784x512x1024 measures
~0.136 ms (0.50 of SoL) INVARIANT to block_k / accum_dots / gather_db /
transpose_out, while its n=256 sibling runs at SoL (0.046 ms). This
pass times each weak shape's winner config against the SAME kernel with
``static_gather=True`` (static slab offsets, wrong results, byte-
identical otherwise): if static ~= SoL, the dynamic-offset slab slice
is the bound (Mosaic copies it); if static ~= full, the cost is
elsewhere (DMA shapes, out pattern, scheduling).

Writes results/ell_gather_probe_r4.json.
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

SHAPES = (  # (m, n, k, b): the sub-0.85-frac-SoL survivors
    (784, 512, 1024, 32),
    (196, 512, 2048, 32),
    (784, 256, 1024, 32),   # control: runs AT SoL — probe must agree
    (12544, 64, 576, 32),
    (3136, 256, 512, 32),
)


def main() -> int:
    from sparsifyme_tpu.bench.harness import build_ell_operand
    from sparsifyme_tpu.bench.roofline import ell_sol_ms
    from sparsifyme_tpu.bench.tuning import lookup
    from sparsifyme_tpu.ops.kernels.ell_kernel import ell_spmm_pallas
    from sparsifyme_tpu.utils.timing import time_kernel

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)
    out = {}
    for m, n, k, b in SHAPES:
        te = (lookup(m, n, k, b) or {}).get("ell") or {}
        if te.get("formulation") == "expand":
            te = dict(te, formulation="gather")  # probe the gather path
        bkb = te.get("block_k") or (32 if k < 512 else
                                    (64 if k < 1536 else 128))
        ff = bool(te.get("fold_first",
                         m % 128 != 0 and (m * b) % 128 == 0))
        key = jax.random.PRNGKey(0)
        ka, kb2 = jax.random.split(key)
        a = jax.random.normal(ka, (b, m, k), jnp.bfloat16)
        bm = jax.random.normal(kb2, (k, n), jnp.bfloat16)
        e, kp = build_ell_operand(a, block_size=128, block_k=bkb,
                                  fold_first=ff)
        bp = jnp.pad(bm, ((0, kp - k), (0, 0)))
        vals = e.values.reshape(-1, e.values.shape[-1])
        cols = e.col_indices.reshape(-1, e.col_indices.shape[-1])
        kw = dict(block_size=128, block_k=bkb,
                  out_dtype=jnp.bfloat16,
                  block_n=te.get("block_n"),
                  transpose_out=bool(te.get("transpose_out", False)),
                  accum_dots=bool(te.get("accum_dots", False)))
        row = {"config": {**te, "block_k": bkb, "fold_first": ff},
               "sol_ms": ell_sol_ms(m, n, k, b)}
        for sg in (False, True):
            t = time_kernel(
                lambda v, c, y, _sg=sg: ell_spmm_pallas(
                    v, c, y, static_gather=_sg, **kw),
                (vals, cols, bp), carrier=2, iters=8, reps=3)
            row["static" if sg else "full"] = t.ms
            print(f"  {m}x{n}x{k} sg={int(sg)}: {t.ms:.4f} ms "
                  f"(sol {row['sol_ms']:.4f})", flush=True)
        row["gather_cost_ms"] = row["full"] - row["static"]
        out[f"{m}x{n}x{k}x{b}"] = row
    path = os.path.join(REPO, "results", "ell_gather_probe_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
        f.write("\n")
    print(f"-> wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
