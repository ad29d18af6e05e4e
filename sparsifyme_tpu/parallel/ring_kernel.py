"""Pallas ring kernel: row-partitioned 2:4 SpMM with EXPLICIT overlapped
halo exchange (double-buffered inter-chip RDMA).

`spmm_sharded.spmm_24_ring` rotates B shards with `lax.ppermute` and
relies on XLA to schedule the collective concurrently with the matmul.
This kernel makes the overlap *structural* (SURVEY.md §7 step 5): each
ring step STARTS the RDMA of the currently-held B shard to the right
neighbor's other comm slot, THEN runs the MXU contraction for the k-slice
matching the held shard, THEN waits on the DMA semaphores — the transfer
rides the ICI while the MXU is busy, by construction rather than by
scheduler grace.

Layout contract (inside `shard_map` over a 1-D mesh axis of size P):

* ``v0/v1/codes``: this chip's k-major compressed planes ``[k4, mloc]``
  (full contraction axis, local rows — the row partition).
* ``b_shard``: this chip's ``[4*k4/P, n]`` slice of B, rows
  **pre-permuted quarter-major within the shard** (`ring_permute_b`) so
  the kernel's compact-domain expansion contracts it directly; the
  permutation is shard-local, so it survives rotation unchanged.
* Output: local ``[mloc, n]`` rows of C (f32 accumulation).

The whole working set (planes + 2 comm slots + accumulator) must fit
VMEM — this is the demonstration/medium-problem kernel; the `ppermute`
formulation remains the arbitrarily-large fallback. Verified on the
forced-host CPU mesh via the TPU interpreter (`pltpu.InterpretParams`,
including `detect_races=True` — the sanitizer story for the comm path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..containers import Sparse24
from ..ops.kernels.spmm24_kernel import _expand


def ring_permute_b(b: jax.Array, p: int) -> jax.Array:
    """Pre-permute B's rows quarter-major *within each 1/p shard* (row
    ``4g+q`` of a shard moves to ``q*k4_shard+g``), so every ring step's
    compact-domain expansion can contract the received shard as-is."""
    k, n = b.shape
    if k % (4 * p):
        raise ValueError(f"k {k} not divisible by 4*P {4 * p}")
    k4s = k // (4 * p)
    return (
        b.reshape(p, k4s, 4, n).swapaxes(1, 2).reshape(k, n)
    )


def _ring_kernel(me_ref, v0_ref, v1_ref, codes_ref, bshard_ref, out_ref,
                 comm_ref, acc_ref, send_sem, recv_sem, cap_sem, *,
                 p: int, k4s: int):
    me = me_ref[0]
    right = jax.lax.rem(me + 1, p)
    left = jax.lax.rem(me + p - 1, p)

    # Stage the local shard into comm slot 0 and barrier with both
    # neighbors: nobody may RDMA into us before our slots are staged.
    comm_ref[0] = bshard_ref[...]
    if p > 1:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    def step(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def rdma():
            return pltpu.make_async_remote_copy(
                src_ref=comm_ref.at[slot],
                dst_ref=comm_ref.at[nxt],
                send_sem=send_sem.at[slot],
                recv_sem=recv_sem.at[nxt],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )

        # Capacity handshake (race found by InterpretParams
        # detect_races: without it, step i+1's RDMA can overwrite the
        # neighbor's slot while its step-i MXU contraction still reads
        # it). The reader signals "slot free" to the device that writes
        # into it (its LEFT neighbor) after each step's compute; the
        # writer waits that credit before every send except the first
        # (the staging barrier covers the never-read slot 1).
        @pl.when((i >= 1) & (i + 1 < p))
        def _wait_capacity():
            pltpu.semaphore_wait(cap_sem.at[nxt], 1)

        @pl.when(i + 1 < p)
        def _start():
            rdma().start()

        # MXU work overlapping the transfer: after i rotations we hold
        # the shard of chip (me - i) % p == k-groups [src*k4s, ...).
        src = jax.lax.rem(me - i + p, p)
        start = src * k4s
        af = _expand(
            v0_ref[pl.ds(start, k4s), :],
            v1_ref[pl.ds(start, k4s), :],
            codes_ref[pl.ds(start, k4s), :],
            k4s,
        )  # quarter-major [4*k4s, mloc]
        part = jax.lax.dot_general(
            af, comm_ref[slot], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i == 0)
        def _init():
            acc_ref[...] = part

        @pl.when(i > 0)
        def _acc():
            acc_ref[...] = acc_ref[...] + part

        @pl.when(i < p - 2)
        def _free():
            # Done reading comm[slot]: return the buffer credit to the
            # device that writes into it.
            pltpu.semaphore_signal(
                cap_sem.at[slot], inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

        @pl.when(i + 1 < p)
        def _wait():
            rdma().wait()

        return 0

    jax.lax.fori_loop(0, p, step, 0)
    out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def spmm_24_ring_pallas(
    s: Sparse24,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    *,
    out_dtype=None,
    interpret: Optional[object] = None,
    collective_id: int = 7,
) -> jax.Array:
    """Ring 2:4 SpMM with explicit double-buffered RDMA halo exchange.

    Same contract as `spmm_sharded.spmm_24_ring` (A row-partitioned, B
    k-sharded, batched A folds into rows); see module docstring for the
    VMEM-residency restriction. ``interpret``: pass
    ``pltpu.InterpretParams(...)`` on non-TPU backends (the CPU-mesh
    test path); defaults to interpreter iff the backend is not TPU.
    """
    import numpy as np

    *lead, m, k = s.shape
    m_total = int(np.prod(lead, dtype=np.int64)) * m if lead else m
    if len(mesh.shape) != 1:
        # The kernel addresses neighbors by LOGICAL device id computed
        # from the ring-axis index — only the flat id on a 1-D mesh.
        # Build a 1-D submesh over the ring axis for multi-axis layouts.
        raise ValueError(
            f"spmm_24_ring_pallas needs a 1-D mesh (got {dict(mesh.shape)})")
    p = mesh.shape[axis]
    if m_total % p:
        raise ValueError(f"rows {m_total} % P {p} != 0")
    k4 = s.values0.shape[-2]
    if k4 % p:
        raise ValueError(f"k4 {k4} % P {p} != 0")
    k4s = k4 // p
    n = b.shape[-1]
    out_dtype = out_dtype or jnp.promote_types(s.dtype, b.dtype)
    if interpret is None and jax.default_backend() != "tpu":
        interpret = pltpu.InterpretParams(dma_execution_mode="on_wait")
    elif interpret is None:
        interpret = False

    bp = jnp.pad(b, ((0, 4 * k4 - b.shape[0]), (0, 0)))
    bperm = ring_permute_b(bp, p)

    def local(v0, v1, codes, b_shard):
        mloc = v0.shape[-1]
        me = jax.lax.axis_index(axis).astype(jnp.int32).reshape(1)
        return pl.pallas_call(
            functools.partial(_ring_kernel, p=p, k4s=k4s),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mloc, n), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 4 * k4s, n), b_shard.dtype),  # comm slots
                pltpu.VMEM((mloc, n), jnp.float32),          # accumulator
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),  # buffer credits
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=collective_id,
            ),
            interpret=interpret,
        )(me, v0, v1, codes, b_shard)

    spec_plane = P(None, axis)
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_plane, spec_plane, spec_plane, P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    out = f(s.values0, s.values1, s.codes, bperm)
    return out.reshape(*lead, m, out.shape[-1])
