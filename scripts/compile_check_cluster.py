"""AOT compile-check of the two-level cluster kernels on real TPU.

Compiles (does NOT execute) cluster_cull + cluster_sweep through Mosaic —
catches layout/alignment rejections without touching the device.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops import pallas_cluster as pc

print('devices:', jax.devices())

rng = np.random.default_rng(0)
t = 60000
centers = rng.uniform(-10, 10, (t, 3)).astype(np.float32)
tri = centers[:, None, :] + rng.normal(0, 0.3, (t, 3, 3)).astype(np.float32)
cm = pc.build_clustered(tri)
print('clusters:', cm.n_clusters, 'top max_leaf:', cm.top_max_leaf)

n = 4096
org_s = jax.ShapeDtypeStruct((n, 3), jnp.float32)
tm_s = jax.ShapeDtypeStruct((n,), jnp.float32)


def cull(org, dirn, tmax):
    return pc.cluster_cull(cm, org, dirn, tmax)


def sweep(ids, counts, keys, org, dirn, tmax, tmin):
    return pc.cluster_sweep(ids, counts, keys, cm.packed,
                            org, dirn, tmax, tmin)


c1 = jax.jit(cull).lower(org_s, org_s, tm_s).compile()
print('cull compiled OK')
ids_s = jax.ShapeDtypeStruct((n // pc.BLOCK, pc.MAXC), jnp.int32)
cnt_s = jax.ShapeDtypeStruct((n // pc.BLOCK, 1), jnp.int32)
key_s = jax.ShapeDtypeStruct((n // pc.BLOCK, pc.MAXC), jnp.float32)
c2 = jax.jit(sweep).lower(ids_s, cnt_s, key_s, org_s, org_s,
                          tm_s, tm_s).compile()
print('sweep compiled OK')
print('cull flops:', c1.cost_analysis().get('flops', '?'))
print('sweep flops:', c2.cost_analysis().get('flops', '?'))
