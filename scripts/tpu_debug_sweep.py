"""Bisect the on-device sweep mismatch (interpret OK, hardware wrong).

Variants:
  A. as-is (early break + slab skip active)
  B. keys=0 (early break can never fire: keys[kn]=0 < max_tout always)
  C. tmax huge AND keys=-1 — same as B but also entry-key ordering gone
Compares each against the brute-force oracle on the same device.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas_cluster import (
    build_clustered, cluster_cull, cluster_sweep, flat_soup, BLOCK, MAXC)
from pathtracer_tpu.ops.traverse import brute_force_hit

print('devices:', jax.devices(), flush=True)

rng = np.random.default_rng(0)
G = 122
xs = np.linspace(-20, 20, G + 1, dtype=np.float32)
X, Z = np.meshgrid(xs, xs, indexing='ij')
Y = 3.0 * np.sin(X * 0.6) * np.cos(Z * 0.5) + 1.2 * np.sin(X * 1.7 + 2.0)
V = np.stack([X, Y, Z], -1)
q00, q10, q01, q11 = V[:-1, :-1], V[1:, :-1], V[:-1, 1:], V[1:, 1:]
tris = np.concatenate([
    np.stack([q00, q10, q11], 2).reshape(-1, 3, 3),
    np.stack([q00, q11, q01], 2).reshape(-1, 3, 3)], 0).astype(np.float32)
cm = build_clustered(tris)
print('tris:', tris.shape[0], 'clusters:', cm.n_clusters, flush=True)

n = BLOCK
org_np = np.array([0.0, 25.0, 34.0], np.float32)[None, :] \
    + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
d_np = rng.normal(size=(n, 3)).astype(np.float32)
d_np[:, 1] -= 1.2
d_np[:, 2] -= 1.5
d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
org = jnp.asarray(org_np)
dirn = jnp.asarray(d_np)
tmax = jnp.full((n,), 1e30, jnp.float32)
tmin = jnp.full((n,), -1.0, jnp.float32)

ref = brute_force_hit(flat_soup(cm), org, dirn)
t_ref = np.asarray(ref.t)

ids, count, keys = cluster_cull(cm, org, dirn, tmax)
print('count:', np.asarray(count)[:, 0].tolist(), flush=True)

for name, k in (('A sorted keys', keys),
                ('B keys=0', jnp.zeros_like(keys)),):
    t, tri, al, be = cluster_sweep(ids, count, k, cm.packed,
                                   org, dirn, tmax, tmin)
    t_np = np.asarray(t)
    bad = np.abs(t_np - t_ref) > 1e-3
    print(f'{name}: wrong {bad.sum()}/{n}  '
          f'(miss-when-ref-hits {np.sum(bad & (t_np >= 1e29))}, '
          f'hit-when-ref-misses {np.sum(bad & (t_ref >= 1e29))})',
          flush=True)
    if bad.any():
        i = int(np.argmax(bad))
        print('  example lane', i, 't_dev', t_np[i], 't_ref', t_ref[i],
              'tri_ref', int(np.asarray(ref.tri)[i]),
              'ref cluster', int(np.asarray(ref.tri)[i]) // 512, flush=True)
