"""Pallas prune/compress kernels vs the XLA ops (interpret mode).

On TPU, `ops.prune.prune_nm` and `ops.sparse24.compress_24` dispatch to
the Pallas kernels in `ops.kernels.prune_kernel`; on CPU they use the
XLA formulation. These tests pin bit-identical agreement between the two
paths (the kernels run interpreted here — the sanitizer story).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sparsifyme_tpu.ops.kernels.prune_kernel import (
    compress_24_pallas,
    prune_nm_pallas,
)
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24


@pytest.mark.parametrize("shape,n,m", [
    ((3, 100, 147), 2, 4),
    ((64, 256), 2, 4),
    ((8, 64), 1, 4),
    ((2, 24), 2, 8),
])
def test_prune_kernel_matches_op(rng, shape, n, m):
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pw, pm = prune_nm(w, n, m)
    gw, gm = prune_nm_pallas(w, n, m)
    assert np.array_equal(np.asarray(pw), np.asarray(gw))
    assert np.array_equal(np.asarray(pm), np.asarray(gm))


def test_prune_kernel_ties(rng):
    # Equal magnitudes: later positions must win, both paths.
    w = jnp.asarray([[1.0, -1.0, 1.0, -1.0, 0.0, 0.0, 2.0, 2.0]])
    pw, _ = prune_nm(w, 2, 4)
    gw, _ = prune_nm_pallas(w, 2, 4)
    assert np.array_equal(np.asarray(pw), np.asarray(gw))
    # group 0: positions 2,3 survive the tie
    np.testing.assert_array_equal(np.asarray(gw)[0, :4], [0, 0, 1, -1])


@pytest.mark.parametrize("rows,k", [(320, 148), (64, 64), (128, 2304)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_compress_kernel_matches_op(rng, rows, k, dtype):
    w = jnp.asarray(rng.normal(size=(rows, k)), dtype)
    pw, _ = prune_nm(w, 2, 4)
    s = compress_24(pw)
    wp = jnp.pad(pw, ((0, 0), (0, (-k) % 4)))
    v0, v1, codes = compress_24_pallas(jnp.swapaxes(wp, 0, 1))
    assert np.array_equal(np.asarray(s.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(s.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(s.codes), np.asarray(codes))
