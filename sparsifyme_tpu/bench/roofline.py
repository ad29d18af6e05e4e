"""Per-shape speed-of-light model for the sparse-vs-dense sweep.

The reference's GPU numbers (`/root/reference/examples/compare.csv`) ride
Ampere sparse tensor cores / cuSPARSE blocked-ELL, which *skip FLOPs*.
The TPU MXU is a dense systolic array: a 2:4 kernel still executes every
MAC, so its physical headroom over dense is bounded by

  * A-operand HBM traffic: 5 bytes per group of 4 (two bf16 values + one
    code byte) = 1.25 B/elem vs 2 B/elem dense -> 1.6x (1.78x with codes
    packed two-groups-per-byte), and
  * the VPU cost of decompressing tiles in VMEM, which bounds throughput
    whenever ``n`` is small enough that the MXU would otherwise outrun
    the decompressor.

Blocked-ELL at 50% block sparsity skips half the MACs *and* half the A
bytes, so its ceiling is ~2x on both compute- and bandwidth-bound shapes.

This module turns those facts into a per-shape speed-of-light (SoL)
estimate so the benchmark can report "fraction of the physically
achievable speedup" next to the raw speedup — the roofline table
BASELINE's 1.5x target is judged against (the target is unreachable for
2:4 on compute-bound shapes on ANY dense-MXU hardware).

Machine constants default to values measured on the bench chip (TPU v5e
via axon relay); re-measure with :func:`measure_machine`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict


@dataclasses.dataclass(frozen=True)
class Machine:
    """Measured machine constants (see :func:`measure_machine`)."""

    mxu_tflops: float = 194.0     # dense bf16 matmul, large square (anchor;
    # round-3 master run measured 194.7 = 99% of the v5e 197 peak —
    # round 2's 182 made every SoL denominator ~7% too easy)
    hbm_gbps: float = 780.0       # achieved large-transfer HBM bandwidth
    vpu_tops: float = 3.4         # achieved elementwise f32/bf16 op rate
    expand_ops_per_elem: float = 4.5  # VPU ops per expanded A element
    # Effective VPU ops per element for 2:4 (|value|, position) ranking
    # with the int32-key formulation, 128-lane-chunked rolls. Calibrated
    # from the round-3 TPU probe: ranking a 401408x256 bf16 tile set
    # measured ~1.4 ms chunked => ~35 ops/elem at the measured VPU rate
    # (each of the 9 lane rolls is several machine ops). This is what
    # bounds prune/compress/fused BELOW the HBM floor — the MXU-era
    # intuition that pruning is "pure bandwidth" does not hold when the
    # selection policy is a real magnitude ranking.
    rank_ops_per_elem: float = 35.0
    # The MXU-assisted ranking formulation (prune_kernel._rank_masks_mxu,
    # bf16) moves the group rotations and the kept-before prefix onto
    # the MXU: ~20 VPU ops/elem remain, and the dots cost ~608
    # MACs/elem (3 rotation + 1 prefix contractions at 128 MACs/elem +
    # 3 compaction contractions at 32). The fused floor takes whichever
    # formulation is faster per element.
    rank_mxu_vpu_ops: float = 20.0
    rank_mxu_flops_per_elem: float = 1216.0


V5E = Machine()


def _mxu_eff(n: int) -> float:
    """MXU column utilization: n < 128 underfills the systolic array."""
    return min(n, 128) / 128.0


def dense_sol_ms(m: int, n: int, k: int, b: int, mc: Machine = V5E) -> float:
    rows = m * b
    flops = 2.0 * rows * k * n
    byts = 2.0 * rows * k + 2.0 * k * n + 2.0 * rows * n
    return max(flops / (mc.mxu_tflops * 1e12 * _mxu_eff(n)),
               byts / (mc.hbm_gbps * 1e9)) * 1e3


def spmm24_sol_ms(m: int, n: int, k: int, b: int, mc: Machine = V5E,
                  packed_codes: bool = False) -> float:
    rows = m * b
    flops = 2.0 * rows * k * n           # the MXU cannot skip 2:4 MACs
    a_bpe = 1.125 if packed_codes else 1.25
    byts = a_bpe * rows * k + 2.0 * k * n + 2.0 * rows * n
    vpu = mc.expand_ops_per_elem * rows * k / (mc.vpu_tops * 1e12)
    return max(flops / (mc.mxu_tflops * 1e12 * _mxu_eff(n)),
               byts / (mc.hbm_gbps * 1e9),
               vpu) * 1e3


def ell_sol_ms(m: int, n: int, k: int, b: int, mc: Machine = V5E,
               density: float = 0.5) -> float:
    rows = m * b
    flops = 2.0 * rows * k * n * density   # block-skip: real FLOP savings
    byts = 2.0 * rows * k * density + 2.0 * k * n + 2.0 * rows * n
    return max(flops / (mc.mxu_tflops * 1e12 * _mxu_eff(n)),
               byts / (mc.hbm_gbps * 1e9)) * 1e3


def fused_sol_ms(m: int, k: int, b: int, mc: Machine = V5E) -> float:
    """Fused prune+compress speed-of-light: one dense read + compact
    writes (HBM term) vs the magnitude-ranking engine term — the
    cheaper of the roll-based VPU ranking and the MXU-assisted ranking
    (each element must still be ranked; which unit pays differs by
    formulation). (The reference's prune is positional zeroing with no
    ranking, `sparsify.hxx:58-59`; its 3-5%-of-gemm phase cost is not
    comparable to a real magnitude-ranked prune.)"""
    elems = m * b * k
    byts = (2.0 + 1.25) * elems
    rank_roll = mc.rank_ops_per_elem / (mc.vpu_tops * 1e12)
    rank_mxu = max(mc.rank_mxu_vpu_ops / (mc.vpu_tops * 1e12),
                   mc.rank_mxu_flops_per_elem / (mc.mxu_tflops * 1e12))
    rank = elems * min(rank_roll, rank_mxu)
    return max(byts / (mc.hbm_gbps * 1e9), rank) * 1e3


def prune_sol_ms(m: int, k: int, b: int, mc: Machine = V5E) -> float:
    """Standalone N:M prune speed-of-light: read + pruned & mask writes
    (3 dense planes) vs the ranking VPU term."""
    elems = m * b * k
    byts = 3 * 2.0 * elems
    vpu = mc.rank_ops_per_elem * elems / (mc.vpu_tops * 1e12)
    return max(byts / (mc.hbm_gbps * 1e9), vpu) * 1e3


def shape_roofline(m: int, n: int, k: int, b: int,
                   mc: Machine = V5E) -> Dict[str, float]:
    """SoL speedups over the dense *roofline* (not measured dense)."""
    d = dense_sol_ms(m, n, k, b, mc)
    return {
        "dense_sol_ms": d,
        "spmm24_sol_ms": spmm24_sol_ms(m, n, k, b, mc),
        "ell_sol_ms": ell_sol_ms(m, n, k, b, mc),
        "spmm24_sol_speedup": d / spmm24_sol_ms(m, n, k, b, mc),
        "ell_sol_speedup": d / ell_sol_ms(m, n, k, b, mc),
    }


def measure_machine(dtype=None) -> Machine:
    """Measure the constants on the current default device.

    Uses the relay-proof chained timer (`utils.timing`): a 4096^3 bf16
    matmul for the MXU rate, a large bf16 copy-add for HBM bandwidth, and
    a chain of compare-selects for the VPU op rate.
    """
    import jax
    import jax.numpy as jnp

    from ..utils.timing import time_kernel

    dtype = dtype or jnp.bfloat16
    key = jax.random.PRNGKey(0)
    n = 4096
    a = jax.random.normal(key, (n, n), dtype)
    bmat = jax.random.normal(key, (n, n), dtype)
    t = time_kernel(
        lambda x, y: jnp.matmul(x, y, preferred_element_type=jnp.float32
                                ).astype(dtype),
        (a, bmat), carrier=1)
    mxu = 2.0 * n**3 / (t.ms * 1e9)

    big = jax.random.normal(key, (8192, 8192), dtype)  # 128 MB
    t = time_kernel(lambda x, y: x + y, (big, big + 1), carrier=0)
    hbm = 3.0 * big.size * 2 / (t.ms * 1e6)  # 2 reads + 1 write

    c = jax.random.normal(key, (4096, 4096), dtype)
    sel = jax.random.randint(key, (4096, 4096), 0, 4, jnp.int32)

    def vpu_fn(x, s):
        z = jnp.zeros((), x.dtype)
        y = x
        for q in range(4):  # 4x (compare + select + add) = 12 ops/elem
            y = y + jnp.where(s == q, x, z)
        return y

    t = time_kernel(vpu_fn, (c, sel), carrier=0)
    vpu = 12.0 * c.size / (t.ms * 1e9) / 1e3  # Tops/s

    return Machine(mxu_tflops=mxu, hbm_gbps=hbm, vpu_tops=vpu)


if __name__ == "__main__":
    mc = measure_machine()
    print(dataclasses.asdict(mc))
