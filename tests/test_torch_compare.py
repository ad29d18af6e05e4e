"""Cross-implementation agreement: JAX 2:4 pipeline vs PyTorch oracle
(the reference's independent-cross-check capability, SURVEY.md C18)."""

import pytest

torch = pytest.importorskip("torch")

from sparsifyme_tpu.bench.torch_compare import (  # noqa: E402
    jax_torch_agreement,
    time_torch_pair,
)


def test_jax_torch_agreement():
    # CPU f32: the two stacks must agree tightly.
    assert jax_torch_agreement(32, 64, 16) < 1e-5


def test_torch_pair_schema():
    r = time_torch_pair(32, 16, 64, 2, density=0.1, reps=1)
    assert set(r) == {"dense_ms", "sparse_ms", "convert_ms", "rel_err"}
    assert r["rel_err"] < 1e-5
