"""Sharded sparse matmuls: batch/row partitioning + ring halo exchange.

The multi-chip layer mandated by BASELINE configs[4] ("row-partitioned
batched 2:4 SpMM across a multi-host slice with halo exchange overlapped
via async collectives"). The reference has no distributed story
(SURVEY.md section 2, parallelism table) — this is the TPU-native design:

* :func:`spmm_24_batch_sharded` — batch axis over the mesh: the
  replacement for OpenMP-threads x CUDA-streams (`spmm.hxx:94`). Zero
  communication; each chip runs the single-chip Pallas kernel on its
  batch shard.
* :func:`spmm_24_row_sharded` — A row(m)-partitioned, B replicated:
  zero-comm operand partitioning (the reference analog is the shared-B
  design, `gemm.cu:40-41`).
* :func:`spmm_24_ring` — A row-partitioned *and* B k-sharded: each chip
  owns a [k/P, n] slice of B; a `lax.ppermute` ring rotates B shards
  while each step multiplies the matching k-slice of the local compressed
  A — compute on step i overlaps the transfer of step i+1's shard (XLA
  schedules the collective-permute concurrently with the matmul). This is
  the halo-exchange pattern: no chip ever holds full B.

All functions build on `shard_map`, so they compose with jit/grad and run
on any `Mesh` (including the forced-host CPU mesh used in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..containers import Sparse24
from ..ops.sparse24 import spmm_24


def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def spmm_24_batch_sharded(
    s: Sparse24, b: jax.Array, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """Batched 2:4 SpMM with the batch dim sharded over ``axis``.

    ``s`` must have a leading batch dim divisible by the axis size.
    B is replicated. No communication is required (outputs stay
    batch-sharded) — the DP analog of per-batch streams.
    """
    if len(s.shape) < 3:
        raise ValueError("batch-sharded spmm needs a leading batch dim")
    *lead, m, k = s.shape
    import numpy as np

    bsz = int(np.prod(lead))
    P_ = mesh.shape[axis]
    if bsz % P_:
        raise ValueError(f"batch {bsz} not divisible by axis size {P_}")

    def local(v0, v1, codes, bmat):
        # Planes are k-major batch-folded [k4, bsz*m]; a lane-chunk of
        # (bsz/P)*m columns is exactly bsz/P whole batch elements
        # (batch-major fold).
        s_local = Sparse24(v0, v1, codes, shape=(bsz // P_, m, k))
        return spmm_24(s_local, bmat).reshape(-1, bmat.shape[-1])

    spec_a = P(None, axis)
    f = _shard_map(
        local, mesh,
        in_specs=(spec_a, spec_a, spec_a, P(None, None)),
        out_specs=P(axis, None),
    )
    out = f(s.values0, s.values1, s.codes, b)
    return out.reshape(*lead, m, out.shape[-1])


def spmm_24_row_sharded(
    s: Sparse24, b: jax.Array, mesh: Mesh, axis: str = "model"
) -> jax.Array:
    """2:4 SpMM with A's rows (m) sharded over ``axis``, B replicated.

    Planes are k-major ``(..., k4, m)``, so the row (m) shard axis is the
    *last* plane axis; the output ``(..., m, n)`` shards on ``-2``.
    """
    *lead, m, k = s.shape

    def local(v0, v1, codes, bmat):
        # Planes [k4, M]: the folded row axis (batch-major) shards on
        # lanes; each chip computes its row-slab against replicated B.
        s_local = Sparse24(
            v0, v1, codes, shape=(v0.shape[-1], k)
        )
        return spmm_24(s_local, bmat)

    spec_a = P(None, axis)
    f = _shard_map(
        local, mesh,
        in_specs=(spec_a, spec_a, spec_a, P(None, None)),
        out_specs=P(axis, None),
    )
    out = f(s.values0, s.values1, s.codes, b)
    return out.reshape(*lead, m, out.shape[-1])


def spmm_24_ring(
    s: Sparse24,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    out_dtype=None,
) -> jax.Array:
    """Row-partitioned 2:4 SpMM with B k-sharded and ring halo exchange.

    Layout: A (compressed) sharded over rows (m) along ``axis``; B sharded
    over its contraction rows (k) along the same axis. Each of the P steps
    multiplies the local A k-slice that matches the currently-held B shard
    and forwards the shard to the next chip (`lax.ppermute`). XLA overlaps
    the permute with the matmul — compute hides the halo transfer
    (configs[4]).

    Batched A (leading dims on ``s``) folds into rows — the library's
    batch-fold idiom: planes are already k-major batch-folded
    ``[k4, B*m]``, so the row partition shards whole batch elements
    (batch-major fold) and the output unfolds for free.

    Requires: prod(batch)*m % P == 0, k4 % P == 0, b.shape[0] % P == 0.
    """
    import numpy as np

    *lead, m, k = s.shape
    m_total = int(np.prod(lead, dtype=np.int64)) * m if lead else m
    P_ = mesh.shape[axis]
    if m_total % P_:
        raise ValueError(
            f"folded rows {m_total} not divisible by axis size {P_}")
    k4 = s.values0.shape[-2]  # planes are k-major [k4, m]
    if k4 % P_:
        raise ValueError(f"k4 {k4} not divisible by axis size {P_}")
    k4_shard = k4 // P_
    out_dtype = out_dtype or jnp.promote_types(s.dtype, b.dtype)

    def local(v0, v1, codes, b_shard):
        # b_shard: [k/P, n] — this chip's slice; it corresponds to k-groups
        # [me*k4_shard, (me+1)*k4_shard) initially and rotates each step.
        me = jax.lax.axis_index(axis)
        nloc = b_shard.shape[-1]
        mloc = v0.shape[-1]
        perm = [(i, (i + 1) % P_) for i in range(P_)]

        def step(i, carry):
            acc, b_cur = carry
            # The ring forwards shards to the next chip, so after i
            # rotations we hold the shard originally owned by (me - i) % P
            # — i.e. k-groups starting at src * k4_shard.
            src = jnp.mod(me - i, P_)
            start = src * k4_shard
            v0_s = jax.lax.dynamic_slice_in_dim(v0, start, k4_shard, axis=0)
            v1_s = jax.lax.dynamic_slice_in_dim(v1, start, k4_shard, axis=0)
            cd_s = jax.lax.dynamic_slice_in_dim(
                codes, start, k4_shard, axis=0
            )
            s_loc = Sparse24(
                v0_s, v1_s, cd_s, shape=(mloc, 4 * k4_shard)
            )
            partial = spmm_24(s_loc, b_cur, out_dtype=jnp.float32)
            # Forward our current shard around the ring (overlapped with
            # the next step's matmul by the XLA scheduler).
            b_next = jax.lax.ppermute(b_cur, axis, perm)
            return acc + partial, b_next

        acc0 = jnp.zeros((mloc, nloc), jnp.float32)
        acc, _ = jax.lax.fori_loop(0, P_, step, (acc0, b_shard))
        return acc.astype(out_dtype)

    spec_plane = P(None, axis)  # k-major planes shard folded rows on -1
    f = _shard_map(
        local, mesh,
        in_specs=(spec_plane, spec_plane, spec_plane, P(axis, None)),
        out_specs=P(axis, None),
    )
    out = f(s.values0, s.values1, s.codes, b)
    return out.reshape(*lead, m, out.shape[-1])
