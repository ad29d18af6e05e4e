"""TPU check + timing for the v2 fused prune+compress kernel.

Parity: planes must be bit-identical to compress_24(prune_nm(w)) on the
real Mosaic lowering (incl. odd shapes k=147/650/1920 the advisor
flagged). Timing: fused/prune/compress vs the analytic HBM floor.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import time

import jax
import jax.numpy as jnp
import numpy as np

from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, prune_compress_24
from sparsifyme_tpu.ops.kernels.prune_kernel import (
    prune_compress_24_pallas, prune_nm_pallas)
from sparsifyme_tpu.utils.timing import time_kernel

print("backend:", jax.default_backend(), jax.devices(), flush=True)

HBM = 780.0  # GB/s


def parity(b, m, k, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(hash((b, m, k)) % 2**31)
    a = jax.random.normal(key, (b, m, k), dtype)
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    s_ref = jax.jit(compress_24)(pruned)
    for kmajor in (True, False):
        v0, v1, codes = jax.jit(
            lambda x, _km=kmajor: prune_compress_24_pallas(
                x.reshape(-1, x.shape[-1]), kmajor=_km))(a)
        ok = (np.array_equal(np.asarray(v0, np.float32),
                             np.asarray(s_ref.values0, np.float32))
              and np.array_equal(np.asarray(v1, np.float32),
                                 np.asarray(s_ref.values1, np.float32))
              and np.array_equal(np.asarray(codes),
                                 np.asarray(s_ref.codes)))
        print(f"  parity b={b} m={m} k={k} {dtype.__name__} "
              f"kmajor={kmajor}: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            d = np.argwhere(np.asarray(codes) != np.asarray(s_ref.codes))
            print("   first code mismatches:", d[:5])
    # standalone prune parity (key-trick path)
    p2, m2 = jax.jit(lambda x: prune_nm_pallas(x, 2, 4))(a)
    ok = np.array_equal(np.asarray(p2, np.float32),
                        np.asarray(pruned, np.float32))
    print(f"  prune parity b={b} m={m} k={k}: {'OK' if ok else 'FAIL'}",
          flush=True)


def timings(b, m, k):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    rows = b * m
    dense_mb = rows * k * 2 / 1e6
    compact_mb = rows * k * 1.25 / 1e6
    floor_fused = (dense_mb + compact_mb) / HBM  # ms
    floor_prune = 3 * dense_mb / HBM
    floor_compress = (dense_mb + compact_mb) / HBM  # post-transpose read
    t_f = time_kernel(prune_compress_24, (a,), carrier=0, iters=8, reps=3)
    pruned = jax.jit(lambda x: prune_nm(x, 2, 4)[0])(a)
    t_p = time_kernel(lambda x: prune_nm(x, 2, 4), (pruned,), carrier=0,
                      iters=8, reps=3)
    t_c = time_kernel(compress_24, (pruned,), carrier=0, iters=8, reps=3)
    print(f"  b={b} m={m} k={k}: fused={t_f.ms:.3f}ms "
          f"(floor {floor_fused:.3f}, x{t_f.ms/floor_fused:.2f}) "
          f"prune={t_p.ms:.3f} (floor {floor_prune:.3f}, "
          f"x{t_p.ms/floor_prune:.2f}) "
          f"compress={t_c.ms:.3f} (floor {floor_compress:.3f}, "
          f"x{t_c.ms/floor_compress:.2f})", flush=True)


t0 = time.time()
print("== parity ==", flush=True)
parity(2, 196, 147)
parity(2, 128, 650)       # kp=704 full-width branch (advisor)
parity(2, 128, 1920)      # kmajor=False (1216, 2048] window (advisor)
parity(4, 784, 1024)
parity(1, 100, 148, jnp.float32)   # f32 non-key path
print("== timings ==", flush=True)
timings(32, 12544, 64)
timings(32, 12544, 256)
timings(32, 12544, 576)
timings(32, 3136, 1152)
timings(32, 196, 4608)
print(f"total {time.time()-t0:.0f}s", flush=True)
