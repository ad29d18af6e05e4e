"""Native host runtime (cpp/ -> libsparsifyme.so) vs JAX/NumPy oracles.

The C++ host layer must make bit-identical mask/selection decisions to the
JAX device path (both implement the (|value|, position) total order), so
these tests assert exact equality, not tolerance.
"""

import os
import subprocess

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sparsifyme_tpu import native  # noqa: E402
from sparsifyme_tpu.ops import ell, prune, sparse24  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built() -> bool:
    if native.available():
        return True
    build = os.path.join(REPO, "cpp", "build")
    try:
        subprocess.run(
            ["cmake", "-S", os.path.join(REPO, "cpp"), "-B", build,
             "-G", "Ninja"],
            check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            ["cmake", "--build", build, "--target", "sparsifyme"],
            check=True, capture_output=True, timeout=300,
        )
    except Exception:
        return False
    native._lib.cache_clear()
    return native.available()


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native library unavailable and unbuildable"
)


def test_abi():
    assert native._lib().sm_abi_version() == 1
    t0 = native.now_ms()
    assert native.now_ms() >= t0


def test_read_shapes(tmp_path):
    p = tmp_path / "shapes.csv"
    p.write_text("m,n,k,b\n12544,64,147,32\n196,512,4608,32\n")
    rows = native.read_shapes(str(p))
    assert rows == [(12544, 64, 147, 32), (196, 512, 4608, 32)]


def test_read_shapes_matches_python(tmp_path):
    from sparsifyme_tpu.utils.shapes import read_shapes as py_read
    path = os.path.join(REPO, "datasets", "resnet50.csv")
    if not os.path.exists(path):
        pytest.skip("datasets not generated")
    assert [tuple(s) for s in py_read(path)] == native.read_shapes(path)


def test_prune_nm_matches_jax(rng):
    w = rng.standard_normal((32, 64)).astype(np.float32)
    pn, mn = native.prune_nm(w, 2, 4)
    pj, mj = prune.prune_nm(jnp.asarray(w), 2, 4)
    np.testing.assert_array_equal(pn, np.asarray(pj))
    np.testing.assert_array_equal(mn, np.asarray(mj).astype(np.uint8))
    assert native.prune_check_nm(pn, 2, 4)
    assert not native.prune_check_nm(w, 2, 4)


def test_compress_24_matches_jax(rng):
    w = rng.standard_normal((16, 32)).astype(np.float32)
    pn, _ = native.prune_nm(w, 2, 4)
    v0, v1, codes = native.compress_24(pn)
    s = sparse24.compress_24(jnp.asarray(pn))
    # native host layout is [m, k4] at the LOGICAL group count; JAX
    # planes are k-major [k4_store, m] with k4_store padded to a
    # multiple of 16 (zero values in the pad region).
    k4 = v0.shape[1]
    np.testing.assert_array_equal(v0, np.asarray(s.values0).T[:, :k4])
    np.testing.assert_array_equal(v1, np.asarray(s.values1).T[:, :k4])
    np.testing.assert_array_equal(codes, np.asarray(s.codes).T[:, :k4])
    assert not np.asarray(s.values0)[k4:].any()
    assert not np.asarray(s.values1)[k4:].any()
    np.testing.assert_array_equal(native.decompress_24(v0, v1, codes, 32), pn)


def test_pack_codes_roundtrip(rng):
    codes = np.asarray(
        sparse24.compress_24(
            jnp.asarray(rng.standard_normal((8, 20)), jnp.float32)
        ).codes
    )
    packed = native.pack_codes(codes)
    assert packed.nbytes == (codes.size + 1) // 2
    np.testing.assert_array_equal(
        native.unpack_codes(packed, codes.size), codes.reshape(-1)
    )


def test_prune_block_matches_jax(rng):
    w = rng.standard_normal((16, 16)).astype(np.float32)
    pn, mn = native.prune_block(w, block=(2, 2), sparsity=0.5)
    pj, mj = prune.prune_block_magnitude(
        jnp.asarray(w), block=(2, 2), sparsity=0.5
    )
    np.testing.assert_array_equal(pn, np.asarray(pj))
    np.testing.assert_array_equal(mn, np.asarray(mj).astype(np.uint8))


def test_ell_from_dense_matches_jax(rng):
    bs, mb, kb, ell_n = 8, 4, 6, 3
    w = rng.standard_normal((mb * bs, kb * bs)).astype(np.float32)
    vals, cols = native.ell_from_dense(w, block_size=bs, ell_blocks=ell_n)
    e = ell.ell_from_dense(jnp.asarray(w), block_size=bs, ell_blocks=ell_n)
    np.testing.assert_array_equal(cols, np.asarray(e.col_indices))
    np.testing.assert_array_equal(vals, np.asarray(e.values))
