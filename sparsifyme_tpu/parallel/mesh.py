"""Device mesh + distributed initialization.

The reference is single-GPU (device 0 hardcoded, `examples/spmma.cu:27-28`)
with batch concurrency via OpenMP threads x CUDA streams (`spmm.hxx:94`).
The TPU-native replacement (mandated by BASELINE configs[4]) is SPMD over
a `jax.sharding.Mesh`: the batch axis shards where streams fanned out, and
operand partitioning + ICI collectives replace the absent NCCL layer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (`jax.distributed`). No-op single-host.

    The multi-process launcher slot the reference leaves empty
    (SURVEY.md section 5, "Distributed communication backend: absent").
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named device mesh.

    Default shape puts all devices on the trailing (model) axis when
    2 axes are requested and the device count is prime-ish; otherwise
    splits evenly. Explicit ``shape`` always wins.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            # Split into two roughly square factors (data-major).
            d = 1
            for f in range(int(np.sqrt(n)), 0, -1):
                if n % f == 0:
                    d = f
                    break
            shape = (d, n // d) + (1,) * (len(axis_names) - 2)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place an array with its leading dim sharded over ``axis`` — the
    DP analog of the reference's one-stream-per-batch fan-out."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
