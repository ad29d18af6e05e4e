"""Flagship sparse-MLP model: forward, SPMD train step, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsifyme_tpu.models.sparse_mlp import (
    MlpConfig,
    forward,
    init_params,
    loss_fn,
    make_train_step,
)
from sparsifyme_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(shape=(2, 4), axis_names=("data", "model"))


def test_forward_shapes():
    config = MlpConfig(dims=(32, 64, 16), dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    x = jnp.ones((8, 32), jnp.float32)
    out = forward(params, x, config)
    assert out.shape == (8, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_weights_are_24_sparse():
    from sparsifyme_tpu.containers import Sparse24
    from sparsifyme_tpu.ops.prune import prune_check_24
    from sparsifyme_tpu.ops.sparse24 import decompress_24

    config = MlpConfig(dims=(32, 64, 16), dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    for i, (v0, v1, codes, bias) in enumerate(params):
        w = decompress_24(
            # planes are k-major [k4, d_out]: rows (m) are the lane axis
            Sparse24(v0, v1, codes, shape=(v0.shape[1], config.dims[i]))
        )
        assert bool(prune_check_24(w))


def test_spmd_train_step_matches_single_device(rng, mesh8):
    config = MlpConfig(dims=(32, 64, 32), dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)

    step = make_train_step(mesh8, config, lr=0.0)  # lr=0: loss check only
    loss_spmd, _ = step(params, x, y)
    loss_single = loss_fn(params, x, y, config)
    np.testing.assert_allclose(
        float(loss_spmd), float(loss_single), rtol=1e-5
    )


def test_spmd_training_decreases_loss(rng, mesh8):
    config = MlpConfig(dims=(32, 64, 32), dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    # Learnable target: a fixed random linear map of x.
    t = jnp.asarray(rng.normal(size=(32, 32)) * 0.3, jnp.float32)
    y = x @ t

    step = make_train_step(mesh8, config, lr=5e-2)
    loss0, params = step(params, x, y)
    for _ in range(30):
        loss, params = step(params, x, y)
    assert float(loss) < 0.7 * float(loss0), (float(loss0), float(loss))


def test_structure_preserved_by_training(rng, mesh8):
    # SGD on compressed values must keep the 2:4 structure (codes fixed).
    config = MlpConfig(dims=(32, 64, 32), dtype="float32")
    params = init_params(jax.random.PRNGKey(0), config)
    codes_before = [np.asarray(p[2]) for p in params]
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    step = make_train_step(mesh8, config, lr=5e-2)
    _, params = step(params, x, y)
    for cb, p in zip(codes_before, params):
        np.testing.assert_array_equal(cb, np.asarray(p[2]))
