"""TPU verify drive: prune->check->compress->spmm_24 and ELL (gather +
expand) vs oracles on real shapes, incl. unaligned + fallback flows."""
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsifyme_tpu.ops import prune, sparse24, ell

assert jax.default_backend() == "tpu", jax.default_backend()
key = jax.random.PRNGKey(0)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(1e-9, np.abs(b).max())


# --- 2:4 path on a ResNet-50 shape (bf16) + unaligned shape ---------------
for (m, k, n) in [(784, 1024, 256), (100, 148, 96)]:
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    bm = jax.random.normal(key, (k, n), jnp.bfloat16)
    ap, mask = prune.prune_nm(a, 2, 4)
    assert prune.prune_check_nm(ap, 2, 4), (m, k, n)
    s = sparse24.compress_24(ap)
    c = sparse24.spmm_24(s, bm, out_dtype=jnp.float32)
    want = np.asarray(ap, np.float64) @ np.asarray(bm, np.float64)
    r = rel(c, want)
    print(f"spmm24 m={m} k={k} n={n}: rel={r:.2e}")
    assert r < 2e-2, r

# --- ELL gather + expand (block 128x32) + small-block fallback ------------
for (m, k, n, bs, bkb) in [(784, 256, 130, 128, 32), (256, 64, 64, 128, 32),
                           (64, 64, 32, 8, 8)]:
    mp = -(-m // bs) * bs
    kp = -(-k // (2 * bkb)) * (2 * bkb)
    a = jax.random.normal(key, (mp, kp), jnp.bfloat16)
    bm = jax.random.normal(key, (kp, n), jnp.bfloat16)
    e = jax.jit(lambda x: ell.ell_from_dense(
        x, block_size=bs, ell_blocks=max(1, (kp // bkb) // 2),
        block_k=bkb))(a)
    want = np.asarray(ell.ell_to_dense(e), np.float64) @ np.asarray(
        bm, np.float64)
    got = ell.spmm_ell(e, bm, out_dtype=jnp.float32)
    r1 = rel(got, want)
    got_t = ell.spmm_ell(e, bm, out_dtype=jnp.float32, transpose_out=True)
    r2 = rel(np.asarray(got_t).T, want)
    r3 = r4 = 0.0
    if bs % 128 == 0:
        vkm = jax.jit(ell.ell_values_kmajor)(e)
        ge = ell.spmm_ell_expand(e, bm, out_dtype=jnp.float32,
                                 values_km=vkm)
        r3 = rel(ge, want)
        ge_t = ell.spmm_ell_expand(e, bm, out_dtype=jnp.float32,
                                   transpose_out=True, values_km=vkm)
        r4 = rel(np.asarray(ge_t).T, want)
    print(f"ell m={mp} k={kp} n={n} bs={bs}: gather={r1:.2e}/{r2:.2e} "
          f"expand={r3:.2e}/{r4:.2e}")
    for r in (r1, r2, r3, r4):
        assert r < 2e-2, (m, k, n, bs, r)

# --- f32 dtype + batched shared-B ----------------------------------------
a = jax.random.normal(key, (4, 256, 128), jnp.float32)
bm = jax.random.normal(key, (128, 64), jnp.float32)
ap, _ = prune.prune_nm(a, 2, 4)
s = sparse24.compress_24(ap)
c = sparse24.spmm_24(s, bm, out_dtype=jnp.float32)
want = np.einsum("bmk,kn->bmn", np.asarray(ap, np.float64),
                 np.asarray(bm, np.float64))
r = rel(c, want)
print(f"spmm24 batched f32: rel={r:.2e}")
assert r < 2e-2, r  # f32 operands ride the bf16 MXU contraction path

print("VERIFY_TPU_OK")
