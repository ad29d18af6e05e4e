"""Isolate the fused prune+compress kernel's cost components on TPU.

Variants on the 12544x64x256x32 (rows=401408) and k=576 shapes:
  io    — read dense tile, write garbage compact planes (IO+grid floor)
  rank  — + key-ranking (no compaction dots)
  dot1  — + ONE chunked sel@xm^T dot (written to all three planes)
  v2    — the shipped kernel (3 dots, k-major out)
  rm    — standard-orientation dots -> row-major planes + XLA transpose
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsifyme_tpu.ops.kernels.prune_kernel import (
    _beat_count_key, _rank_key_i32, _slot_masks_from_keep)
from sparsifyme_tpu.ops.sparse24 import prune_compress_24
from sparsifyme_tpu.utils.timing import time_kernel

print("backend:", jax.default_backend(), flush=True)
HBM = 780.0


def _sel(w, mm_dtype):
    rr = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (w // 4, w), 1)
    return (cc // 4 == rr).astype(mm_dtype)


def _selT(w, mm_dtype):
    rr = jax.lax.broadcasted_iota(jnp.int32, (w, w // 4), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (w, w // 4), 1)
    return (rr // 4 == cc).astype(mm_dtype)


def _masks(x):
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 4

    def lane_roll(v, s):
        return pltpu.roll(v, s % v.shape[1], 1)

    key = _rank_key_i32(x, pos)
    keep32 = jnp.where(_beat_count_key(key, pos, 4, lane_roll) < 2, 1, 0)
    m0, m1 = _slot_masks_from_keep(keep32, pos, lane_roll)
    return pos, m0, m1


def kernel_io(x_ref, v0_ref, v1_ref, codes_ref, *, bk):
    # Pure IO+grid floor: read the tile, write scalar-broadcast planes
    # (no transpose, no ranking, no dots; the scalar dep defeats DCE).
    x = x_ref[...]
    t = (jnp.zeros(v0_ref.shape, jnp.float32)
         + jnp.sum(x[0:8, 0:128].astype(jnp.float32))).astype(
        v0_ref.dtype)
    v0_ref[...] = t
    v1_ref[...] = t
    codes_ref[...] = jnp.ones(v0_ref.shape, jnp.uint8)


def kernel_rank(x_ref, v0_ref, v1_ref, codes_ref, *, bk):
    # IO + key-ranking, no compaction dots: the masked operands feed the
    # output through a cheap full reduction (keeps ranking alive).
    x = x_ref[...]
    pos, m0, m1 = _masks(x)
    xm0 = x * m0.astype(x.dtype)
    xm1 = x * m1.astype(x.dtype)
    z = jnp.zeros(v0_ref.shape, jnp.float32)
    v0_ref[...] = (z + jnp.sum(xm0.astype(jnp.float32))).astype(
        v0_ref.dtype)
    v1_ref[...] = (z + jnp.sum(xm1.astype(jnp.float32))).astype(
        v1_ref.dtype)
    codes_ref[...] = jnp.ones(v0_ref.shape, jnp.uint8)


def kernel_dot1(x_ref, v0_ref, v1_ref, codes_ref, *, bk):
    x = x_ref[...]
    pos, m0, m1 = _masks(x)
    mm = x.dtype
    xm0 = (x * m0.astype(x.dtype)).astype(mm)
    dn = (((1,), (1,)), ((), ()))
    off = 0
    while off < bk:
        w = min(128, bk - off)
        sel = _sel(w, mm)
        sl = slice(off, off + w)
        g = slice(off // 4, (off + w) // 4)
        v0c = jax.lax.dot_general(sel, xm0[:, sl], dn,
                                  preferred_element_type=jnp.float32)
        v0_ref[g, :] = v0c.astype(v0_ref.dtype)
        v1_ref[g, :] = v0c.astype(v1_ref.dtype)
        codes_ref[g, :] = v0c.astype(jnp.int32).astype(jnp.uint8)
        off += w


def kernel_rm(x_ref, v0_ref, v1_ref, codes_ref, *, bk):
    """Standard-orientation dots: xm [bm, w] @ selT [w, w/4] -> row-major
    compact planes [bm, bk/4]."""
    x = x_ref[...]
    pos, m0, m1 = _masks(x)
    mm = x.dtype
    xm0 = (x * m0.astype(x.dtype)).astype(mm)
    xm1 = (x * m1.astype(x.dtype)).astype(mm)
    code_src = (pos * (4 * m0 + m1)).astype(mm)
    dn = (((1,), (0,)), ((), ()))
    off = 0
    while off < bk:
        w = min(128, bk - off)
        selT = _selT(w, mm)
        sl = slice(off, off + w)
        g = slice(off // 4, (off + w) // 4)
        v0_ref[:, g] = jax.lax.dot_general(
            xm0[:, sl], selT, dn,
            preferred_element_type=jnp.float32).astype(v0_ref.dtype)
        v1_ref[:, g] = jax.lax.dot_general(
            xm1[:, sl], selT, dn,
            preferred_element_type=jnp.float32).astype(v1_ref.dtype)
        codes_ref[:, g] = jax.lax.dot_general(
            code_src[:, sl], selT, dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32).astype(jnp.uint8)
        off += w


def run_variant(name, kernel, rows, kp, bm, bk, kmajor_out, dtype=jnp.bfloat16,
                post_transpose=False):
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, kp), dtype)
    grid = (rows // bm, kp // bk)
    if kmajor_out:
        pspec = pl.BlockSpec((bk // 4, bm), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM)
        shapes = [jax.ShapeDtypeStruct((kp // 4, rows), dtype)] * 2 + [
            jax.ShapeDtypeStruct((kp // 4, rows), jnp.uint8)]
    else:
        pspec = pl.BlockSpec((bm, bk // 4), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        shapes = [jax.ShapeDtypeStruct((rows, kp // 4), dtype)] * 2 + [
            jax.ShapeDtypeStruct((rows, kp // 4), jnp.uint8)]

    @jax.jit
    def f(xx):
        v0, v1, cd = pl.pallas_call(
            functools.partial(kernel, bk=bk),
            grid=grid,
            in_specs=[pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pspec, pspec, pspec],
            out_shape=shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
        )(xx)
        if post_transpose:
            v0, v1, cd = v0.T, v1.T, cd.T
        return v0, v1, cd

    print(f"  {name}: compiling/timing...", flush=True)
    t = time_kernel(f, (x,), carrier=0, iters=8, reps=3)
    floor = (rows * kp * (2 + 1.25)) / 1e6 / HBM
    print(f"  {name:6s} bm={bm:5d} bk={bk:4d}: {t.ms:.3f} ms "
          f"(x{t.ms / floor:.2f} of {floor:.3f})", flush=True)
    return t.ms


t0 = time.time()
for rows, kp in ((401408, 256), (401408, 576)):
    print(f"== rows={rows} kp={kp} ==", flush=True)
    bk = kp if kp % 128 else min(512, kp)
    bk = 256 if kp == 256 else 576
    cap = max(128, ((1 << 19) // bk) // 128 * 128)
    bm = next(d for d in range(cap, 127, -128) if rows % d == 0)
    run_variant("rank", kernel_rank, rows, kp, bm, bk, True)
    run_variant("dot1", kernel_dot1, rows, kp, bm, bk, True)
    run_variant("rm", kernel_rm, rows, kp, bm, bk, False,
                post_transpose=True)
    run_variant("rm-not", kernel_rm, rows, kp, bm, bk, False,
                post_transpose=False)
    # shipped v2 for reference
    x3 = jax.random.normal(jax.random.PRNGKey(0), (32, 12544, kp),
                           jnp.bfloat16)
    t = time_kernel(prune_compress_24, (x3,), carrier=0, iters=8, reps=3)
    print(f"  v2 shipped: {t.ms:.3f} ms", flush=True)
print(f"total {time.time() - t0:.0f}s", flush=True)
