"""On-device perf of the two-level cluster kernels at production scale.

1M-triangle terrain, 1080p-scale coherent primary rays.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas_cluster import (
    build_clustered, two_level_hit, cluster_cull, BLOCK, MAXC)

print('devices:', jax.devices(), flush=True)

G = 708                           # 2*G^2 tris
xs = np.linspace(-20, 20, G + 1, dtype=np.float32)
X, Z = np.meshgrid(xs, xs, indexing='ij')
Y = 3.0 * np.sin(X * 0.6) * np.cos(Z * 0.5) + 1.2 * np.sin(X * 1.7 + 2.0)
V = np.stack([X, Y, Z], -1)
q00, q10, q01, q11 = V[:-1, :-1], V[1:, :-1], V[:-1, 1:], V[1:, 1:]
tris = np.concatenate([
    np.stack([q00, q10, q11], 2).reshape(-1, 3, 3),
    np.stack([q00, q11, q01], 2).reshape(-1, 3, 3)], 0).astype(np.float32)
print('tris:', tris.shape[0], flush=True)

t0 = time.perf_counter()
cm = build_clustered(tris)
jax.block_until_ready(cm.packed)
print(f'clusters: {cm.n_clusters} '
      f'(build {time.perf_counter() - t0:.1f}s)', flush=True)

H, W = 1080, 1920
n = H * W                         # 2,073,600 -> pads to 2025 packets
cam = np.array([0.0, 30.0, 38.0], np.float32)
ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
d = np.stack([(jj - W / 2) / W * 1.6,
              -(ii - H / 2) / H * 0.9 - 0.55,
              -np.ones_like(ii)], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
org = jnp.broadcast_to(jnp.asarray(cam), (n, 3))
dirn = jnp.asarray(d.reshape(-1, 3))
tmax = jnp.full((n,), 1e30, jnp.float32)

print('compile + first run...', flush=True)
t0 = time.perf_counter()
t, tri, al, be = two_level_hit(cm, org, dirn, tmax)
t.block_until_ready()
print(f'  first: {time.perf_counter() - t0:.1f}s', flush=True)
hitfrac = float((np.asarray(t) < 1e29).mean())

ids, count, keys = cluster_cull(cm, org, dirn, tmax)
c = np.asarray(count)[:, 0]
print(f'clusters/packet: min {c.min()} med {int(np.median(c))} '
      f'max {c.max()} overflow {(c > MAXC).sum()}/{len(c)}', flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    t, tri, al, be = two_level_hit(cm, org, dirn, tmax)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    print(f'  rep{rep}: {dt * 1e3:.0f}ms -> {n / dt / 1e6:.1f}M rays/s '
          f'(hit {hitfrac:.2f})', flush=True)

# phase split
t0 = time.perf_counter()
ids, count, keys = cluster_cull(cm, org, dirn, tmax)
ids.block_until_ready()
print(f'  cull alone: {(time.perf_counter() - t0) * 1e3:.0f}ms', flush=True)
