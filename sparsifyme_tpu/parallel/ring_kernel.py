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


# ---------------------------------------------------------------------------
# Grid-tiled ring (round 5): m-tiles stream through the explicit RDMA
# ring, removing the whole-working-set VMEM-residency restriction
# (VERDICT r4 item 5) — ResNet-scale row shards fit.
# ---------------------------------------------------------------------------


def _ring_kernel_tiled(me_ref, v0_ref, v1_ref, codes_ref, bshard_ref,
                       out_ref, comm_ref, pv0_ref, pv1_ref, pc_ref,
                       send_sem, recv_sem, cap_sem, plane_sem, *,
                       p: int, k4s: int, mt: int, n_mt: int):
    """m-tile j outer, ring step i inner (grid = (n_mt, p)).

    Each m-tile runs a full P-step ring over the SAME comm slots —
    structurally the single-shot `_ring_kernel` repeated n_mt times,
    with a re-stage at every tile boundary and the capacity-credit
    protocol extended across tiles (a reused barrier semaphore would
    let rounds mix with >= 3 devices; the cross-tile slot-1 credit is
    exact instead — see inline comment). Ring-inner ordering keeps the f32 output block's
    accumulation CONSECUTIVE in the grid — the only revisit pattern the
    TPU block pipeline defines — at the price of re-sending the B shard
    once per m-tile (comm volume x n_mt; ICI-resident, and the
    ppermute formulation remains the comm-optimal fallback).

    Planes live in HBM (`pltpu.ANY`); only the ``[k4s, mt]`` slice a
    (tile, step) pair needs is DMA'd into a ping-pong VMEM slab,
    double-buffered against the expand+dot, so per-shard VMEM is
    O(k4s * (mt + n)) — independent of mloc (VERDICT r4 item 5).
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    me = me_ref[0]
    right = jax.lax.rem(me + 1, p)
    left = jax.lax.rem(me + p - 1, p)
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

    def src_rows(step):
        return pl.ds(jax.lax.rem(me - step + p, p) * k4s, k4s)

    def plane_copies(step, buf):
        cs = pl.ds(j * mt, mt)
        rs = src_rows(step)
        return [
            pltpu.make_async_copy(hbm.at[rs, cs], vmem.at[buf],
                                  plane_sem.at[buf, idx])
            for idx, (hbm, vmem) in enumerate(
                ((v0_ref, pv0_ref), (v1_ref, pv1_ref),
                 (codes_ref, pc_ref)))
        ]

    @pl.when((i == 0) & (j == 0))
    def _barrier():
        # One initial rendezvous: remote scratch addresses must be live
        # on both neighbors before the first RDMA targets them.
        if p > 1:
            barrier = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)

    @pl.when(i == 0)
    def _stage():
        # Re-stage the local shard at every tile boundary (slot 0 was
        # rotated over during the previous tile's ring). Local
        # sequencing orders this after our own tile-(j-1) reads; the
        # slot-1 cross-tile credit (below) orders the LEFT neighbor's
        # first send of this tile after our last read of slot 1.
        comm_ref[0] = bshard_ref[...]
        for cp in plane_copies(0, 0):
            cp.start()

    # Capacity credits gate every overwrite of a neighbor's comm slot
    # behind that neighbor's last read of it. Within a tile: the send at
    # step i overwrites the slot the receiver read at step i-1 (existing
    # round-3 protocol, race-checked). Across tiles: the FIRST send of
    # tile j (i == 0, writes slot 1) must follow the receiver's LAST
    # read of slot 1 in tile j-1 — step `last_odd` — so that read
    # signals the credit and the (j > 0, i == 0) send waits it. The
    # counts balance exactly (semaphores drain to zero at kernel end).
    last_odd = p - 1 if p % 2 == 0 else p - 2

    @pl.when((i + 1 < p) & ((i >= 1) | (j > 0)))
    def _wait_capacity():
        pltpu.semaphore_wait(cap_sem.at[nxt], 1)

    @pl.when(i + 1 < p)
    def _send():
        rdma().start()

    buf = jax.lax.rem(i, 2)

    @pl.when(i + 1 < p)
    def _prefetch_planes():
        for cp in plane_copies(i + 1, 1 - buf):
            cp.start()

    # Wait for THIS step's plane tiles (started at i-1, or in _stage).
    for idx, (hbm, vmem) in enumerate(
            ((v0_ref, pv0_ref), (v1_ref, pv1_ref), (codes_ref, pc_ref))):
        pltpu.make_async_copy(
            hbm.at[src_rows(i), pl.ds(j * mt, mt)],
            vmem.at[buf], plane_sem.at[buf, idx],
        ).wait()

    af = _expand(pv0_ref[buf], pv1_ref[buf], pc_ref[buf], k4s)
    part = jax.lax.dot_general(
        af, comm_ref[slot], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        out_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        out_ref[...] = out_ref[...] + part

    @pl.when((i < p - 2) | ((i == last_odd) & (j < n_mt - 1)))
    def _free():
        pltpu.semaphore_signal(
            cap_sem.at[slot], inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL)

    @pl.when(i + 1 < p)
    def _wait():
        rdma().wait()


def _pick_mt(mloc: int, cap: int = 2048) -> int:
    """Largest 128-multiple divisor of ``mloc`` under ``cap`` (lane-dim
    tiles must be 128-aligned); falls back to ``mloc`` whole."""
    for mt in range(min(cap, mloc) - min(cap, mloc) % 128, 127, -128):
        if mloc % mt == 0:
            return mt
    return mloc


def spmm_24_ring_tiled_pallas(
    s: Sparse24,
    b: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    *,
    out_dtype=None,
    m_tile: Optional[int] = None,
    interpret: Optional[object] = None,
    collective_id: int = 8,
) -> jax.Array:
    """Ring 2:4 SpMM with explicit RDMA halo exchange, m-tiles streamed.

    Same contract as :func:`spmm_24_ring_pallas` but WITHOUT the
    whole-working-set VMEM residency restriction: plane tiles stream
    from HBM through a double-buffered VMEM slab and the f32 output
    accumulates through the grid's block pipeline, so per-shard row
    counts at ResNet scale (e.g. (m*b, k) = (6272, 1024) per shard)
    fit. The ppermute formulation (`spmm_sharded.spmm_24_ring`) remains
    the layout-flexible fallback.
    """
    import numpy as np

    *lead, m, k = s.shape
    m_total = int(np.prod(lead, dtype=np.int64)) * m if lead else m
    if len(mesh.shape) != 1:
        raise ValueError(
            f"spmm_24_ring_tiled_pallas needs a 1-D mesh "
            f"(got {dict(mesh.shape)})")
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

    mloc = m_total // p
    mt = m_tile or _pick_mt(mloc)
    if mloc % mt:
        raise ValueError(f"m_tile {mt} must divide mloc {mloc}")
    n_mt = mloc // mt

    def local(v0, v1, codes, b_shard):
        me = jax.lax.axis_index(axis).astype(jnp.int32).reshape(1)
        out = pl.pallas_call(
            functools.partial(_ring_kernel_tiled, p=p, k4s=k4s, mt=mt,
                              n_mt=n_mt),
            grid=(n_mt, p),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((4 * k4s, n), lambda jj, ii: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mt, n), lambda jj, ii: (jj, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mloc, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 4 * k4s, n), b_shard.dtype),  # comm
                pltpu.VMEM((2, k4s, mt), v0.dtype),
                pltpu.VMEM((2, k4s, mt), v1.dtype),
                pltpu.VMEM((2, k4s, mt), codes.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),  # capacity credits
                pltpu.SemaphoreType.DMA((2, 3)),    # plane tile DMAs
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                collective_id=collective_id,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interpret,
        )(me, v0, v1, codes, b_shard)
        return out.astype(out_dtype)

    spec_plane = P(None, axis)
    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_plane, spec_plane, spec_plane, P(axis, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    out = f(s.values0, s.values1, s.codes, bperm)
    return out.reshape(*lead, m, out.shape[-1])
