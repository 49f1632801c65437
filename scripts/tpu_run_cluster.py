"""Guarded first on-device run of the two-level cluster kernels.

Small shapes, correctness vs brute force computed on the same device.
Run under `timeout`; if it hangs, kill the exact PID and health-check
with a matmul after 2-5 min (see CLAUDE.md wedge recovery).
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas_cluster import (
    build_clustered, two_level_hit, cluster_cull, BLOCK, MAXC)
from pathtracer_tpu.ops.pallas_cluster import flat_soup
from pathtracer_tpu.ops.traverse import brute_force_hit

print('devices:', jax.devices(), flush=True)

# small mesh: ~30k tris -> 15 clusters
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
print('tris:', tris.shape[0], flush=True)
cm = build_clustered(tris)
print('clusters:', cm.n_clusters, flush=True)

n = 2 * BLOCK
org_np = np.array([0.0, 25.0, 34.0], np.float32)[None, :] \
    + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
d_np = rng.normal(size=(n, 3)).astype(np.float32)
d_np[:, 1] -= 1.2
d_np[:, 2] -= 1.5
d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
org = jnp.asarray(org_np)
dirn = jnp.asarray(d_np)
tmax = jnp.full((n,), 1e30, jnp.float32)

print('phase 1 (cull)...', flush=True)
t0 = time.perf_counter()
ids, count, keys = cluster_cull(cm, org, dirn, tmax)
ids.block_until_ready()
print(f'  cull OK in {time.perf_counter() - t0:.1f}s '
      f'(counts {np.asarray(count)[:, 0].tolist()})', flush=True)

print('phase 2 (sweep)...', flush=True)
t0 = time.perf_counter()
t, tri, al, be = two_level_hit(cm, org, dirn, tmax)
t.block_until_ready()
print(f'  sweep OK in {time.perf_counter() - t0:.1f}s', flush=True)

ref = brute_force_hit(flat_soup(cm), org, dirn)
t_np = np.asarray(t)
t_ref = np.asarray(ref.t)
hit = t_ref < 1e29
print('hit fraction:', hit.mean(), flush=True)
print('max |t-t_ref|:', np.abs(t_np - t_ref).max())
print('tri match:', (np.asarray(tri) == np.asarray(ref.tri)).mean())
print('al match:',
      np.abs(np.asarray(al) - np.asarray(ref.alpha))[hit].max())
assert np.abs(t_np - t_ref).max() < 1e-3
print('ON-DEVICE CORRECTNESS: OK', flush=True)
