"""Unit probes: does Mosaic overlap an independent VPU expand with an MXU
dot in one kernel body?  Times three kernel variants on fixed tiles:

  dot    — MXU contraction from a (garbage) VMEM slab + all real DMAs
  expand — VPU quarter-select expansion into a slab + all real DMAs
  both   — the two together, touching disjoint slabs

If both ~= max(dot, expand): units overlap -> the FP pipeline design is
sound.  If both ~= dot + expand: Mosaic serializes compute -> minimize
VPU ops instead.  Also prints machine constants (roofline.measure_machine).
"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsifyme_tpu.utils.timing import time_kernel
from sparsifyme_tpu.ops.kernels.spmm24_kernel import (
    _expand_q_into, _dot_ct, _round_up)


def probe_kernel(v0_ref, v1_ref, codes_ref, b_ref, out_ref, af_ref, af2_ref,
                 *, bk4, mode, tout):
    def expand_to(ref):
        def write(q, val):
            ref[q * bk4:(q + 1) * bk4, :] = val
        _expand_q_into(write, v0_ref[...], v1_ref[...], codes_ref[...])

    if mode == "parity":
        # The real FP kernel's structure: slab choice branches on step
        # parity (4 pl.when bodies).
        t = pl.program_id(0)
        parity = jax.lax.rem(t, 2)

        @pl.when(parity == 1)
        def _d0():
            out_ref[...] = _dot_ct(af_ref[...], b_ref[...], tout).astype(
                out_ref.dtype)

        @pl.when(parity == 0)
        def _d1():
            out_ref[...] = _dot_ct(af2_ref[...], b_ref[...], tout).astype(
                out_ref.dtype)

        @pl.when(parity == 0)
        def _e0():
            expand_to(af_ref)

        @pl.when(parity == 1)
        def _e1():
            expand_to(af2_ref)
        return

    if mode == "chain":
        # Cross-step dependency, no branches: dot reads the slab the
        # previous step expanded (single slab: serial hazard is real,
        # but tests whether cross-step scratch reuse breaks pipelining).
        part = _dot_ct(af_ref[...], b_ref[...], tout)
        expand_to(af2_ref)
        out_ref[...] = (part + jnp.sum(af2_ref[:, 0:1])).astype(
            out_ref.dtype)
        return

    if mode in ("dot", "both"):
        part = _dot_ct(af_ref[...], b_ref[...], tout)
    else:
        part = jnp.zeros(out_ref.shape, jnp.float32)
    if mode in ("expand", "both"):
        expand_to(af2_ref)
        # Keep the expand alive: a scalar probe of the slab (touches all
        # four quarter stores through lane 0, costs ~4*bk4 adds).
        part = part + jnp.sum(af2_ref[:, 0:1])
    out_ref[...] = part.astype(out_ref.dtype)


def run_probe_fp1(m, n, k, *, bm, tout=False, with_cost=False):
    """The parity probe + the real FP kernel's extended grid and shifted
    index maps (n_k == 1 case) — bisects the probe-vs-real gap."""
    k4 = k // 4
    bk4 = k4
    mp = _round_up(m, bm)
    npad = _round_up(n, 16 if tout else 128)
    T = mp // bm
    key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (k4, mp), jnp.bfloat16)
    v1 = jax.random.normal(key, (k4, mp), jnp.bfloat16)
    codes = jnp.full((k4, mp), 1, jnp.uint8)
    b = jax.random.normal(key, (4 * k4, npad), jnp.bfloat16)

    def kernel(v0_ref, v1_ref, codes_ref, b_ref, out_ref, af0_ref, af1_ref):
        t = pl.program_id(0)
        parity = jax.lax.rem(t, 2)

        def dot_from(ref):
            out_ref[...] = _dot_ct(ref[...], b_ref[...], tout).astype(
                out_ref.dtype)

        def expand_to(ref):
            def write(q, val):
                ref[q * bk4:(q + 1) * bk4, :] = val
            _expand_q_into(write, v0_ref[...], v1_ref[...], codes_ref[...])

        @pl.when((t > 0) & (parity == 1))
        def _d0():
            dot_from(af0_ref)

        @pl.when((t > 0) & (parity == 0))
        def _d1():
            dot_from(af1_ref)

        @pl.when((t < T) & (parity == 0))
        def _e0():
            expand_to(af0_ref)

        @pl.when((t < T) & (parity == 1))
        def _e1():
            expand_to(af1_ref)

    def planes_im(t):
        te = jnp.minimum(t, T - 1)
        return (0, te)

    def out_im(t):
        return (jnp.maximum(t - 1, 0), 0)

    pspec = pl.BlockSpec((bk4, bm), planes_im, memory_space=pltpu.VMEM)
    kwargs = {}
    if with_cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=5 * k4 * m, transcendentals=0)

    @jax.jit
    def f(v0, v1, codes, b):
        return pl.pallas_call(
            kernel,
            grid=(T + 1,),
            in_specs=[pspec, pspec, pspec,
                      pl.BlockSpec((4 * bk4, npad), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, npad), out_im,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mp, npad), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((4 * bk4, bm), jnp.bfloat16),
                            pltpu.VMEM((4 * bk4, bm), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            **kwargs,
        )(v0, v1, codes, b)

    return time_kernel(f, (v0, v1, codes, b), carrier=3).ms


def run_probe(m, n, k, *, bm, mode, tout=False):
    k4 = k // 4
    bk4 = k4  # single k-tile probes
    mp = _round_up(m, bm)
    npad = _round_up(n, 16 if tout else 128)
    key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (k4, mp), jnp.bfloat16)
    v1 = jax.random.normal(key, (k4, mp), jnp.bfloat16)
    codes = jnp.full((k4, mp), 1, jnp.uint8)
    b = jax.random.normal(key, (4 * k4, npad), jnp.bfloat16)

    grid = (mp // bm,)
    pspec = pl.BlockSpec((bk4, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    if tout:
        out_spec = pl.BlockSpec((npad, bm), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((npad, mp), jnp.bfloat16)
    else:
        out_spec = pl.BlockSpec((bm, npad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((mp, npad), jnp.bfloat16)

    @jax.jit
    def f(v0, v1, codes, b):
        return pl.pallas_call(
            functools.partial(probe_kernel, bk4=bk4, mode=mode, tout=tout),
            grid=grid,
            in_specs=[pspec, pspec, pspec,
                      pl.BlockSpec((4 * bk4, npad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((4 * bk4, bm), jnp.bfloat16),
                            pltpu.VMEM((4 * bk4, bm), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(v0, v1, codes, b)

    t = time_kernel(f, (v0, v1, codes, b), carrier=3)
    return t.ms


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "machine":
        from sparsifyme_tpu.bench.roofline import measure_machine
        import dataclasses
        print(dataclasses.asdict(measure_machine()))
        return
    shapes = [
        # (m, n, k, bm): single k-tile probes
        (3136 * 32, 128, 512, 2048),
        (784 * 32, 256, 1024, 2048),
        (12544 * 32, 64, 576, 2048),
    ]
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else (
        "dot", "expand", "both", "parity")
    for (m, n, k, bm) in shapes:
        res = {}
        for mode in modes:
            if mode == "fp1":
                res[mode] = run_probe_fp1(m, n, k, bm=bm)
            elif mode == "fp1c":
                res[mode] = run_probe_fp1(m, n, k, bm=bm, with_cost=True)
            elif mode.startswith("real"):
                # The actual spmm24_pallas_fp on the probe's own arrays.
                from sparsifyme_tpu.ops.kernels.spmm24_kernel import (
                    spmm24_pallas_fp)
                k4 = k // 4
                key = jax.random.PRNGKey(0)
                v0 = jax.random.normal(key, (k4, m), jnp.bfloat16)
                v1 = jax.random.normal(key, (k4, m), jnp.bfloat16)
                codes = (jnp.zeros((k4, m), jnp.uint8) + 1 if "const" in mode
                         else jax.random.randint(key, (k4, m), 0, 3,
                                                 jnp.int32).astype(jnp.uint8)
                         * 4 + 3)
                bmat = jax.random.normal(key, (k, 128), jnp.bfloat16)
                bmx = bm if "bm" not in mode else int(mode.split("bm")[1])
                res[mode] = time_kernel(
                    lambda a0, a1, c, y: spmm24_pallas_fp(
                        a0, a1, c, y, k_logical=k, out_dtype=jnp.bfloat16,
                        block_m=bmx, block_k4=k4),
                    (v0, v1, codes, bmat), carrier=3).ms
        line = f"m={m} n={n} k={k} bm={bm}: " + " ".join(
            f"{mm}={res[mm]*1e3:7.1f}us" for mm in modes)
        if "dot" in res and "expand" in res and "both" in res:
            overlap = (res["dot"] + res["expand"] - res["both"]) / min(
                res["dot"], res["expand"])
            line += f" overlap_frac={overlap:.2f}"
        print(line)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
