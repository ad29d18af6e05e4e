"""TPU A/B: old spmm24_pallas vs pipelined spmm24_pallas_fp, per
ResNet-50 unique shape, both output layouts. Also times dense gemm,
prune and compress for the round-2 fusion work. One JSON line per shape
to stdout (parse with jq / json.loads)."""
import json
import math
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.ops.kernels.spmm24_kernel import spmm24_pallas_fp
from sparsifyme_tpu.ops.gemm import batched_gemm
from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.utils.shapes import read_shapes
from sparsifyme_tpu.bench.roofline import spmm24_sol_ms, dense_sol_ms

ITERS, REPS = 10, 3


def bench_shape(m, n, k, b):
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), dtype)
    bm = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)
    pruned, _ = jax.jit(lambda x: prune_nm(x, 2, 4))(a)
    s = jax.jit(compress_24)(pruned)
    kp = 4 * s.values0.shape[0]
    bpad = jnp.pad(bm, ((0, kp - k), (0, 0)))

    out = {"m": m, "n": n, "k": k, "b": b}
    flops = 2.0 * b * m * k * n

    t = time_kernel(lambda x, y: batched_gemm(x, y, out_dtype=dtype),
                    (a, bm), carrier=1, iters=ITERS, reps=REPS)
    out["gemm_ms"] = t.ms

    for name, tout in (("old", False), ("old_t", True)):
        t = time_kernel(
            lambda ss, y, _t=tout: spmm_24(ss, y, out_dtype=dtype,
                                           transpose_out=_t),
            (s, bm), carrier=1, iters=ITERS, reps=REPS)
        out[f"{name}_ms"] = t.ms
    for name, tout in (("fp", False), ("fp_t", True)):
        t = time_kernel(
            lambda v0, v1, c, y, _t=tout: spmm24_pallas_fp(
                v0, v1, c, y, k_logical=k, out_dtype=dtype,
                transpose_out=_t),
            (s.values0, s.values1, s.codes, bpad),
            carrier=3, iters=ITERS, reps=REPS)
        out[f"{name}_ms"] = t.ms

    t = time_kernel(lambda x: prune_nm(x, 2, 4), (a,), carrier=0,
                    iters=ITERS, reps=REPS)
    out["prune_ms"] = t.ms
    t = time_kernel(compress_24, (pruned,), carrier=0,
                    iters=ITERS, reps=REPS)
    out["compress_ms"] = t.ms

    out["sol_24_ms"] = spmm24_sol_ms(m, n, k, b)
    out["sol_dense_ms"] = dense_sol_ms(m, n, k, b)
    best_old = min(out["old_ms"], out["old_t_ms"])
    best_fp = min(out["fp_ms"], out["fp_t_ms"])
    out["old_speedup"] = out["gemm_ms"] / best_old
    out["fp_speedup"] = out["gemm_ms"] / best_fp
    out["tflops_fp"] = flops / (best_fp * 1e9)
    return out


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    shapes = read_shapes("datasets/resnet50.csv")
    seen, uniq = set(), []
    for sh in shapes:
        key = (sh.m, sh.n, sh.k, sh.b)
        if key not in seen:
            seen.add(key)
            uniq.append(key)
    rows = []
    for m, n, k, b in uniq:
        r = bench_shape(m, n, k, b)
        rows.append(r)
        print(json.dumps(r), flush=True)

    def geo(key):
        vals = [r[key] for r in rows if r.get(key, 0) > 0]
        return math.exp(sum(math.log(v) for v in vals) / len(vals))

    print(f"# old_speedup_geomean: {geo('old_speedup'):.4f}",
          file=sys.stderr)
    print(f"# fp_speedup_geomean:  {geo('fp_speedup'):.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
