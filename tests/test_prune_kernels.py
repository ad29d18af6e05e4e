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
    # Storage contract: k pads to 64 so k4 is a multiple of 16
    # (sublane quantum) and the SpMM kernels never re-pad planes.
    wp = jnp.pad(pw, ((0, 0), (0, (-k) % 64)))
    v0, v1, codes = compress_24_pallas(jnp.swapaxes(wp, 0, 1))
    assert np.array_equal(np.asarray(s.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(s.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(s.codes), np.asarray(codes))


@pytest.mark.parametrize("rows,k", [(320, 148), (64, 64), (128, 2304),
                                    (1000, 64),
                                    # non-128-multiple kp tile branches
                                    # (full-width lane block / lane pad):
                                    (64, 147), (72, 576), (40, 1200)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("kmajor", [True, False])
def test_fused_prune_compress_matches_two_phase(rng, rows, k, dtype,
                                                kmajor):
    # Fused kernel == compress(prune(w)) bit-for-bit (planes and codes).
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)

    w = jnp.asarray(rng.normal(size=(rows, k)), dtype)
    pw, _ = prune_nm(w, 2, 4)
    want = compress_24(pw)
    v0, v1, codes = prune_compress_24_pallas(w, kmajor=kmajor)
    assert np.array_equal(np.asarray(want.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(want.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(want.codes), np.asarray(codes))


def test_fused_prune_compress_op_batched(rng):
    # Public op: batched input, spmm parity with the two-phase pipeline.
    from sparsifyme_tpu.ops.sparse24 import prune_compress_24, spmm_24

    w = jnp.asarray(rng.normal(size=(3, 100, 148)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(148, 64)), jnp.bfloat16)
    pw, _ = prune_nm(w, 2, 4)
    want = spmm_24(compress_24(pw), b, out_dtype=jnp.float32)
    got = spmm_24(prune_compress_24(w), b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_prune_full_width_odd_k(rng):
    """Odd-k full-width lane tiles (k=650 -> one 652-lane tile) and the
    chunked-ranking path agree with the XLA oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparsifyme_tpu.ops.kernels.prune_kernel import prune_nm_pallas
    from sparsifyme_tpu.ops.prune import prune_nm

    for k in (650, 1920):
        a = jnp.asarray(rng.normal(size=(2, 24, k)), jnp.bfloat16)
        got, gmask = jax.jit(lambda x: prune_nm_pallas(x, 2, 4))(a)
        # XLA-formulation oracle (same ranking semantics)
        kp = -(-k // 4) * 4
        ap = jnp.pad(a, ((0, 0), (0, 0), (0, kp - k)))
        pos = jax.lax.broadcasted_iota(jnp.int32, ap.shape, 2) % 4
        ab = jnp.abs(ap)
        cnt = jnp.zeros(ap.shape, jnp.int32)
        for s in range(1, 4):
            fwd = jnp.roll(ab, -s, axis=-1)
            bwd = jnp.roll(ab, 4 - s, axis=-1)
            wraps = pos + s >= 4
            pa = jnp.where(wraps, bwd, fwd)
            ppos = jnp.where(wraps, pos + s - 4, pos + s)
            beats = (pa > ab) | ((pa == ab) & (ppos > pos))
            cnt = cnt + beats.astype(jnp.int32)
        want = jnp.where(cnt < 2, ap, 0)[:, :, :k]
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))


def test_fused_rank_mxu_bit_identical(rng):
    """MXU-assisted ranking (rotations + prefix as exact 0/1
    contractions) selects bit-identically to compress(prune) — the
    shared (|value|, position) invariant."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)
    from sparsifyme_tpu.ops.prune import prune_nm
    from sparsifyme_tpu.ops.sparse24 import compress_24

    for (b, m, k) in [(2, 196, 147), (1, 100, 148), (1, 64, 1024)]:
        a = jnp.asarray(rng.normal(size=(b, m, k)), jnp.bfloat16)
        s = compress_24(prune_nm(a, 2, 4)[0])
        v0, v1, codes = prune_compress_24_pallas(
            a.reshape(-1, k), rank_mxu=True)
        np.testing.assert_array_equal(
            np.asarray(v0, np.float32), np.asarray(s.values0, np.float32))
        np.testing.assert_array_equal(
            np.asarray(v1, np.float32), np.asarray(s.values1, np.float32))
        np.testing.assert_array_equal(
            np.asarray(codes, np.int32), np.asarray(s.codes, np.int32))


@pytest.mark.parametrize("rows,k", [(64, 147), (64, 650), (128, 192)])
@pytest.mark.parametrize("pad128", [True, False])
def test_fused_lane_pad_in_kernel(rng, rows, k, pad128):
    """Odd-k full-width tiles: lanes padded inside the kernel (no HBM
    pad pass), with and without rounding the tile to a 128 multiple —
    planes stay bit-identical to the two-phase oracle."""
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)

    w = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)
    pw, _ = prune_nm(w, 2, 4)
    want = compress_24(pw)
    v0, v1, codes = prune_compress_24_pallas(w, pad128=pad128)
    assert np.array_equal(np.asarray(want.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(want.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(want.codes), np.asarray(codes))


@pytest.mark.parametrize("rank_mxu", [False, True])
def test_fused_fold_rows_bit_identical(rng, rank_mxu):
    """Row-fold for k=64 ([rows, 64] -> [rows/2, 128] outside the
    kernel + compact-plane un-interleave): bit-identical to the
    two-phase oracle. Groups of 4 stay intact across the fold and the
    un-interleave restores the [k//4, rows] plane layout exactly."""
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)
    from sparsifyme_tpu.ops.sparse24 import _unfold_planes

    rows, k = 128, 64
    w = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)
    pw, _ = prune_nm(w, 2, 4)
    want = compress_24(pw)
    wf = w.reshape(rows // 2, 128)
    v0, v1, codes = prune_compress_24_pallas(wf, rank_mxu=rank_mxu)
    v0 = _unfold_planes(v0, 2, k // 4, rows)
    v1 = _unfold_planes(v1, 2, k // 4, rows)
    codes = _unfold_planes(codes, 2, k // 4, rows)
    assert np.array_equal(np.asarray(want.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(want.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(want.codes), np.asarray(codes))


@pytest.mark.parametrize("rows,k", [(64, 64), (128, 147), (64, 192)])
def test_fused_pack_rank_bit_identical(rng, rows, k):
    """Lane-packed ranking (sub-128 chunks folded to full vregs): the
    2:4 rolls are 4-periodic so packing f consecutive rows into 128
    lanes never leaks across rows — planes stay bit-identical to the
    two-phase oracle."""
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)

    w = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)
    pw, _ = prune_nm(w, 2, 4)
    want = compress_24(pw)
    v0, v1, codes = prune_compress_24_pallas(w, pad128=False,
                                             pack_rank=True)
    assert np.array_equal(np.asarray(want.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(want.values1), np.asarray(v1))
    assert np.array_equal(np.asarray(want.codes), np.asarray(codes))


def test_fused_block_overrides(rng):
    """block_rows / block_k tuning knobs reach the kernel."""
    from sparsifyme_tpu.ops.kernels.prune_kernel import (
        prune_compress_24_pallas)

    w = jnp.asarray(rng.normal(size=(256, 512)), jnp.bfloat16)
    pw, _ = prune_nm(w, 2, 4)
    want = compress_24(pw)
    v0, v1, codes = prune_compress_24_pallas(w, block_rows=128,
                                             block_k=256)
    assert np.array_equal(np.asarray(want.values0), np.asarray(v0))
    assert np.array_equal(np.asarray(want.codes), np.asarray(codes))
