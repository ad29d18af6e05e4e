"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(d): the standard TPU-less way to test shard_map collectives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.ops.prune import prune_24
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24
from sparsifyme_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from sparsifyme_tpu.parallel.spmm_sharded import (
    spmm_24_batch_sharded,
    spmm_24_ring,
    spmm_24_row_sharded,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(shape=(2, 4), axis_names=("data", "model"))


def _problem(rng, batch, m, k, n):
    a = jnp.asarray(rng.normal(size=(batch, m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    pruned, _ = prune_24(a)
    return compress_24(pruned), b, pruned


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh1 = make_mesh(axis_names=("x",))
    assert mesh1.shape["x"] == 8


def test_batch_sharded_matches_single(rng, mesh8):
    s, b, pruned = _problem(rng, batch=8, m=16, k=32, n=24)
    got = spmm_24_batch_sharded(s, b, mesh8, axis="data")
    want = spmm_24(s, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_row_sharded_matches_single(rng, mesh8):
    s, b, pruned = _problem(rng, batch=1, m=64, k=32, n=16)
    import dataclasses

    # planes are batch-folded [k4, M]: batch=1 is already the unbatched
    # layout; only the logical shape needs restating.
    s2 = dataclasses.replace(s, shape=(64, 32))
    got = spmm_24_row_sharded(s2, b, mesh8, axis="model")
    want = spmm_24(s2, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_ring_matches_single(rng, mesh8):
    # m=32 rows sharded 4-way, k4 = 32 groups sharded 4-way.
    s, b, pruned = _problem(rng, batch=1, m=32, k=128, n=16)
    import dataclasses

    s2 = dataclasses.replace(s, shape=(32, 128))
    got = spmm_24_ring(s2, b, mesh8, axis="model", out_dtype=jnp.float32)
    want = np.asarray(pruned[0], np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_ring_batched_matches_single(rng, mesh8):
    # BASELINE configs[4] mandates *batched* row-partitioned ring SpMM:
    # the batch folds into rows (batch-major), 8 batch x 16 rows = 128
    # folded rows sharded 4-way (whole batch elements per shard).
    s, b, pruned = _problem(rng, batch=8, m=16, k=128, n=24)
    got = spmm_24_ring(s, b, mesh8, axis="model", out_dtype=jnp.float32)
    assert got.shape == (8, 16, 24)
    want = np.einsum(
        "bmk,kn->bmn", np.asarray(pruned, np.float64),
        np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_ring_batched_uneven_fold(rng, mesh8):
    # Folded rows (3*20=60) not divisible by the 4-way axis: must raise,
    # not silently mis-shard.
    s, b, _ = _problem(rng, batch=3, m=18, k=128, n=8)  # 54 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        spmm_24_ring(s, b, mesh8, axis="model")


def test_ring_under_jit(rng, mesh8):
    s, b, pruned = _problem(rng, batch=1, m=32, k=128, n=16)
    import dataclasses

    s2 = dataclasses.replace(s, shape=(32, 128))
    f = jax.jit(
        lambda ss, bb: spmm_24_ring(
            ss, bb, mesh8, axis="model", out_dtype=jnp.float32
        )
    )
    got = f(s2, b)
    want = np.asarray(pruned[0], np.float64) @ np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_shard_batch_placement(rng, mesh8):
    x = jnp.zeros((8, 4, 4))
    xs = shard_batch(x, mesh8, axis="data")
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None, None)
    xr = replicate(x, mesh8)
    assert xr.sharding.spec == jax.sharding.PartitionSpec()


def test_ring_pallas_explicit_overlap(rng):
    """Explicit double-buffered RDMA ring (pltpu.make_async_remote_copy)
    == the single-chip kernel, on the virtual mesh via the TPU
    interpreter with race detection on (the comm-path sanitizer)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh
    from sparsifyme_tpu.parallel.ring_kernel import spmm_24_ring_pallas

    s, b, _ = _problem(rng, batch=2, m=32, k=128, n=24)
    want = spmm_24(s, b, out_dtype=jnp.float32).reshape(-1, 24)
    for p in (1, 4):
        mesh = Mesh(np.array(jax.devices()[:p]), ("model",))
        got = spmm_24_ring_pallas(
            s, b, mesh, "model", out_dtype=jnp.float32,
            interpret=pltpu.InterpretParams(detect_races=True),
        )
        np.testing.assert_allclose(
            np.asarray(got).reshape(-1, 24), np.asarray(want),
            rtol=1e-4, atol=1e-4,
        )


def test_ring_pallas_p2_batched(rng):
    """P=2 + batched A through the RDMA ring (the capacity-credit
    handshake's smallest ring)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh
    from sparsifyme_tpu.parallel.ring_kernel import spmm_24_ring_pallas

    s, b, _ = _problem(rng, batch=4, m=16, k=64, n=16)
    want = spmm_24(s, b, out_dtype=jnp.float32).reshape(-1, 16)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    got = spmm_24_ring_pallas(
        s, b, mesh, "model", out_dtype=jnp.float32,
        interpret=pltpu.InterpretParams(detect_races=True),
    )
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 16),
                               np.asarray(want), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Grid-tiled RDMA ring (round 5): m-tiles stream, no VMEM-residency cap.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("p", [2, 4])
def test_ring_tiled_pallas_matches_oracle(p):
    """Tiled explicit-RDMA ring == dense oracle on the CPU mesh
    (interpreted DMA semantics). P=8 is covered by
    `test_ring_tiled_p8_subprocess`: with ALL host devices in the ring,
    the interpreter's blocking semaphore waits starve its scheduler on
    a 2-CPU host (verified: identical case passes with 16 virtual
    devices), so the full-width case runs in a subprocess with slack
    devices."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24_reference
    from sparsifyme_tpu.parallel.ring_kernel import (
        spmm_24_ring_tiled_pallas)

    devs = jax.devices()[:p]
    mesh = Mesh(np.array(devs), ("model",))
    m, k, n = 16 * p * 16, 64 * p, 24  # several m-tiles per shard
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.float32)
    pruned = prune_nm(a, 2, 4)[0]
    s = compress_24(pruned)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    got = spmm_24_ring_tiled_pallas(s, b, mesh, "model",
                                    out_dtype=jnp.float32, m_tile=128)
    want = spmm_24_reference(s, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ring_tiled_matches_ppermute_path():
    """Tiled ring vs the ppermute formulation: same numbers."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24
    from sparsifyme_tpu.parallel.ring_kernel import (
        spmm_24_ring_tiled_pallas)
    from sparsifyme_tpu.parallel.spmm_sharded import spmm_24_ring

    p = 4
    mesh = Mesh(np.array(jax.devices()[:p]), ("model",))
    m, k, n = 1024, 256, 16
    key = jax.random.PRNGKey(2)
    a = jax.random.normal(key, (m, k), jnp.float32)
    pruned = prune_nm(a, 2, 4)[0]
    s = compress_24(pruned)
    b = jax.random.normal(jax.random.PRNGKey(3), (k, n), jnp.float32)
    got = spmm_24_ring_tiled_pallas(s, b, mesh, "model",
                                    out_dtype=jnp.float32, m_tile=128)
    want = spmm_24_ring(s, b, mesh, "model", out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ring_tiled_batched():
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24_reference
    from sparsifyme_tpu.parallel.ring_kernel import (
        spmm_24_ring_tiled_pallas)

    p = 2
    mesh = Mesh(np.array(jax.devices()[:p]), ("model",))
    b_, m, k, n = 2, 256, 128, 8
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (b_, m, k), jnp.float32)
    pruned = prune_nm(a, 2, 4)[0]
    s = compress_24(pruned)
    bm = jax.random.normal(jax.random.PRNGKey(5), (k, n), jnp.float32)
    got = spmm_24_ring_tiled_pallas(s, bm, mesh, "model",
                                    out_dtype=jnp.float32, m_tile=128)
    want = spmm_24_reference(s, bm, out_dtype=jnp.float32)
    assert got.shape == (b_, m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ring_tiled_p8_subprocess():
    """P=8 tiled ring, run with 16 virtual devices (see note above)."""
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24, spmm_24_reference
from sparsifyme_tpu.parallel.ring_kernel import spmm_24_ring_tiled_pallas
p, mt, n_mt = 8, 128, 2
mesh = Mesh(np.array(jax.devices()[:p]), ('model',))
m, k, n = mt * p * n_mt, 64 * p, 16
a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
s = compress_24(prune_nm(a, 2, 4)[0])
b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
got = spmm_24_ring_tiled_pallas(s, b, mesh, 'model',
                                out_dtype=jnp.float32, m_tile=mt)
want = spmm_24_reference(s, b, out_dtype=jnp.float32)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-2, atol=2e-2)
print('P8-TILED-OK')
"""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert "P8-TILED-OK" in r.stdout, (r.stdout, r.stderr[-2000:])
