"""Round-5 verify drive: public-surface smoke on the real TPU.

Recipe step 2 of .claude/skills/verify: prune->check->compress->spmm_24
and ell_from_dense->spmm_ell on a ResNet-50 shape in bf16 vs the dense
oracles, plus the padding / fallback / dtype / batched flows and the
round-5 changed paths (plan guard with row_chunks-only entries, packed
matmul_cached pre-pack).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp
import numpy as np


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def main():
    print("backend:", jax.default_backend(), flush=True)
    assert jax.default_backend() == "tpu", "drive must run on TPU"
    from sparsifyme_tpu.ops.prune import prune_nm, prune_check_nm
    from sparsifyme_tpu.ops.sparse24 import (
        compress_24, spmm_24, spmm_24_reference, prune_compress_24)
    from sparsifyme_tpu.ops.ell import (
        ell_from_dense, spmm_ell, spmm_ell_reference)
    from sparsifyme_tpu.plan import SpmmaConfig, SpmmaPlan

    checks = []

    def ck(name, err, tol=2e-2):
        ok = err < tol
        checks.append((name, err, ok))
        print(f"  {name}: rel={err:.2e} {'OK' if ok else 'FAIL'}",
              flush=True)

    # -- ResNet-50 shape, bf16, batched shared-B ------------------------
    m, n, k, b = 784, 512, 1024, 8  # b*m = 6272 = 49*128 (ELL blocks)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (b, m, k), jnp.bfloat16)
    bm = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
    pruned = prune_nm(a, 2, 4)[0]
    assert bool(prune_check_nm(pruned, 2, 4)), "prune_check failed"
    s = compress_24(pruned)
    out = spmm_24(s, bm, out_dtype=jnp.float32)
    want = spmm_24_reference(s, bm, out_dtype=jnp.float32)
    ck("spmm24 bf16 batched", rel(out, want))
    # pipelined + packed formulations
    out_p = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True)
    ck("spmm24 pipelined", rel(out_p, want))
    out_pk = spmm_24(s, bm, out_dtype=jnp.float32, pipeline=True,
                     packed_codes=True)
    ck("spmm24 packed", rel(out_pk, want))
    # fused prune+compress == phase pair
    s2 = prune_compress_24(a)
    ck("fused==phases v0", rel(s2.values0, s.values0), 1e-6)

    e = ell_from_dense(pruned.reshape(b * m, k), block_size=128,
                       ell_blocks=4, block_k=128)
    oute = spmm_ell(e, bm, out_dtype=jnp.float32)
    wante = spmm_ell_reference(e, bm, out_dtype=jnp.float32)
    ck("ell bf16", rel(oute, wante))

    # -- unaligned shape (padding paths), f32 --------------------------
    a2 = jax.random.normal(key, (100, 148), jnp.float32)
    p2 = prune_nm(a2, 2, 4)[0]
    s2 = compress_24(p2)
    b2 = jax.random.normal(key, (148, 36), jnp.float32)
    ck("spmm24 unaligned f32",
       rel(spmm_24(s2, b2, out_dtype=jnp.float32),
           spmm_24_reference(s2, b2, out_dtype=jnp.float32)), 1e-4)

    # -- small-block ELL must fall back, not crash ---------------------
    import warnings
    w8 = jax.random.normal(key, (32, 64), jnp.float32)
    e8 = ell_from_dense(w8, block_size=8, ell_blocks=4)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out8 = spmm_ell(e8, jax.random.normal(key, (64, 16), jnp.float32))
    assert out8.shape == (32, 16)
    print("  small-block fallback: OK", flush=True)

    # -- round-5 changed paths -----------------------------------------
    # plan on a TUNED shape (table entries flow through the new guard)
    plan = SpmmaPlan(SpmmaConfig(m=784, n=512, k=1024, batch=8,
                                 dtype="bfloat16", out_dtype="float32"))
    c_plan = plan.matmul(s, bm)
    ck("plan.matmul tuned shape", rel(c_plan, want.reshape(b * m, n)
                                      if c_plan.shape == (b * m, n)
                                      else want))
    # packed pre-pack path
    import sparsifyme_tpu.bench.tuning as tuning
    real_lookup = tuning.lookup
    tuning.lookup = lambda *args, **kw: {"spmm24": {"pipeline": True,
                                                    "packed": True}}
    try:
        plan2 = SpmmaPlan(SpmmaConfig(m=784, n=512, k=1024, batch=8,
                                      dtype="bfloat16",
                                      out_dtype="float32"))
        plan2.set_operand(s)
        assert plan2._operand_packed is not None
        c2 = plan2.matmul_cached(bm)
        ck("plan packed matmul_cached", rel(c2, want))
    finally:
        tuning.lookup = real_lookup

    bad = [c for c in checks if not c[2]]
    print("VERIFY-DRIVE:", "PASS" if not bad else f"FAIL {bad}",
          flush=True)
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
