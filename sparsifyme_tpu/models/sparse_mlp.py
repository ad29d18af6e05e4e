"""Flagship model: an MLP with 2:4 structured-sparse weights.

The reference is a kernel library below the model layer (its "models" are
conv-shape CSVs, SURVEY.md C15/C16); this module is the capability uplift
that exercises the full pipeline the way a production user would: weights
stored compressed (:class:`Sparse24`), forward/backward through the Pallas
SpMM custom-VJP, and an SPMD training step over a ('data', 'model') mesh —
tensor-parallel row-sharded weights with all-gathered activations, data-
parallel batch with gradient psum.

Layer math: ``y = relu(x @ W^T + bias)`` with ``W [d_out, d_in]`` pruned
2:4 along d_in (the contraction axis), computed as
``spmm_24(W24, x^T)^T`` so the sparse operand feeds the MXU kernel
directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..containers import Sparse24
from ..ops.prune import prune_nm
from ..ops.sparse24 import compress_24, spmm_24

# One layer's params as a flat tuple (keeps shard_map specs simple):
# (values0, values1, codes, bias)
LayerParams = Tuple[jax.Array, jax.Array, jax.Array, jax.Array]


@dataclasses.dataclass(frozen=True)
class MlpConfig:
    dims: Tuple[int, ...] = (256, 512, 512, 256)
    dtype: str = "bfloat16"

    @property
    def n_layers(self) -> int:
        return len(self.dims) - 1


def init_params(key, config: MlpConfig) -> List[LayerParams]:
    dims = config.dims
    dtype = jnp.dtype(config.dtype)
    params: List[LayerParams] = []
    for i in range(config.n_layers):
        key, kw = jax.random.split(key)
        d_in, d_out = dims[i], dims[i + 1]
        scale = (2.0 / d_in) ** 0.5
        w = jax.random.normal(kw, (d_out, d_in), dtype) * scale
        w24, _ = prune_nm(w, 2, 4)
        s = compress_24(w24)
        bias = jnp.zeros((d_out,), dtype)
        params.append((s.values0, s.values1, s.codes, bias))
    return params


def _layer(p: LayerParams, x: jax.Array, d_in: int, *, act: bool):
    v0, v1, codes, bias = p
    # Planes are k-major [k4, d_out]: d_out is the last plane axis.
    w = Sparse24(v0, v1, codes, shape=(v0.shape[-1], d_in))
    y = spmm_24(w, x.T, out_dtype=x.dtype).T + bias
    return jax.nn.relu(y) if act else y


def forward(params: Sequence[LayerParams], x: jax.Array,
            config: MlpConfig) -> jax.Array:
    """Single-device forward: x [batch, dims[0]] -> [batch, dims[-1]]."""
    for i, p in enumerate(params):
        x = _layer(p, x, config.dims[i], act=i < config.n_layers - 1)
    return x


def loss_fn(params, x, y, config: MlpConfig) -> jax.Array:
    pred = forward(params, x, config)
    return jnp.mean(jnp.square(pred.astype(jnp.float32) -
                               y.astype(jnp.float32)))


# --------------------------------------------------------------------------
# SPMD training step: data-parallel batch x tensor-parallel (row-sharded W)
# --------------------------------------------------------------------------

def param_specs(config: MlpConfig, model_axis: str = "model"):
    """shard_map specs: W row(d_out)-sharded, bias sharded to match.

    Planes are k-major [k4, d_out], so the d_out shard axis is the last
    plane axis."""
    return tuple(
        (
            P(None, model_axis),  # values0
            P(None, model_axis),  # values1
            P(None, model_axis),  # codes
            P(model_axis),        # bias
        )
        for _ in range(config.n_layers)
    )


def make_train_step(
    mesh: Mesh,
    config: MlpConfig,
    lr: float = 1e-2,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Build a jitted SPMD train step: (params, x, y) -> (loss, params').

    Inside each device: forward through row-sharded sparse layers with
    `all_gather` over the model axis after each layer (transposed to
    `psum_scatter` in the backward pass by AD), then gradient `pmean`
    over the data axis. SGD update applied shard-locally.
    """
    n_layers = config.n_layers

    def local_step(x, y, *flat_params):
        layers = [tuple(flat_params[4 * i: 4 * i + 4])
                  for i in range(n_layers)]

        def local_loss(layers):
            h = x
            for i, (v0, v1, codes, bias) in enumerate(layers):
                d_in = config.dims[i]
                w = Sparse24(v0, v1, codes, shape=(v0.shape[-1], d_in))
                hT = spmm_24(w, h.T, out_dtype=h.dtype)  # [d_out/P, b]
                hT = hT + bias[:, None]
                hT = jax.lax.all_gather(
                    hT, model_axis, axis=0, tiled=True
                )  # [d_out, b]
                h = hT.T
                if i < n_layers - 1:
                    h = jax.nn.relu(h)
            return jnp.mean(jnp.square(h.astype(jnp.float32) -
                                       y.astype(jnp.float32)))

        loss_local, grads = jax.value_and_grad(local_loss, allow_int=True)(
            layers
        )
        # Explicit DP gradient averaging (unambiguous under shard_map AD).
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, data_axis)
            if jnp.issubdtype(g.dtype, jnp.floating) else g,
            grads,
        )
        loss = jax.lax.pmean(loss_local, data_axis)
        new_layers = []
        for (v0, v1, codes, bias), (g0, g1, _, gb) in zip(layers, grads):
            # codes are structural (no gradient).
            new_layers.append((
                (v0.astype(jnp.float32) - lr * g0.astype(jnp.float32))
                .astype(v0.dtype),
                (v1.astype(jnp.float32) - lr * g1.astype(jnp.float32))
                .astype(v1.dtype),
                codes,
                (bias.astype(jnp.float32) - lr * gb.astype(jnp.float32))
                .astype(bias.dtype),
            ))
        return (loss, *[p for l in new_layers for p in l])

    pspecs = param_specs(config, model_axis)
    flat_pspecs = tuple(s for layer in pspecs for s in layer)
    in_specs = (P(data_axis, None), P(data_axis, None)) + flat_pspecs
    out_specs = (P(),) + flat_pspecs

    smapped = jax.shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )

    @jax.jit
    def train_step(params, x, y):
        flat = tuple(p for layer in params for p in layer)
        out = smapped(x, y, *flat)
        loss = out[0]
        rest = out[1:]
        new_params = [tuple(rest[4 * i: 4 * i + 4])
                      for i in range(n_layers)]
        return loss, new_params

    return train_step
