"""TPU validation: fused prune+compress on non-128-multiple kp shapes
(the lowering failure the round-2 bench hit on k=147/576)."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sparsifyme_tpu.ops.kernels.prune_kernel import prune_compress_24_pallas
from sparsifyme_tpu.ops.prune import prune_nm
from sparsifyme_tpu.ops.sparse24 import compress_24

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
for rows, k in [(1024, 147), (512, 576), (256, 1200), (12544 * 2, 147)]:
    for kmajor in (True, False):
        w = jnp.asarray(rng.normal(size=(rows, k)), jnp.bfloat16)
        pw, _ = prune_nm(w, 2, 4)
        want = compress_24(pw)
        v0, v1, codes = prune_compress_24_pallas(w, kmajor=kmajor)
        ok = (np.array_equal(np.asarray(want.values0), np.asarray(v0))
              and np.array_equal(np.asarray(want.values1), np.asarray(v1))
              and np.array_equal(np.asarray(want.codes), np.asarray(codes)))
        print(f"rows={rows} k={k} kmajor={kmajor}: "
              f"{'OK' if ok else 'MISMATCH'}", flush=True)
        assert ok
print("all ok", flush=True)
