"""Cluster-sweep perf: representative closed-scene view + packet shaping.

Variants on the 1M-tri terrain:
  A. raster packets, open-sky grazing view   (the round-1 worst case)
  B. raster packets, top-down view (every ray hits ~immediately)
  C. 32x32-pixel tiled packets, top-down view
  D. 32x32-pixel tiled packets, grazing view
Reports med/max clusters-per-packet and rays/s for each.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas_cluster import (
    build_clustered, two_level_hit, cluster_cull, BLOCK, MAXC)

print('devices:', jax.devices(), flush=True)

G = 708
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
print(f'clusters: {cm.n_clusters} (build {time.perf_counter() - t0:.1f}s)',
      flush=True)

H, W = 1080, 1920
n = H * W


def rays(view, order):
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    if view == 'grazing':
        cam = np.array([0.0, 30.0, 38.0], np.float32)
        d = np.stack([(jj - W / 2) / W * 1.6,
                      -(ii - H / 2) / H * 0.9 - 0.55,
                      -np.ones_like(ii)], -1).astype(np.float32)
    else:                                   # top-down: every ray hits
        cam = np.array([0.0, 60.0, 0.0], np.float32)
        d = np.stack([(jj - W / 2) / W * 0.55,
                      -np.ones_like(ii).astype(np.float32),
                      (ii - H / 2) / H * 0.3], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    if order == 'tiled':                    # 32x32 pixel tiles
        TS = 32
        Hc = (H // TS) * TS
        d = (d[:Hc].reshape(Hc // TS, TS, W // TS, TS, 3)
             .transpose(0, 2, 1, 3, 4).reshape(-1, 3))
        d = np.concatenate([d, d[:H * W - len(d)]], 0)   # repad to n
    else:
        d = d.reshape(-1, 3)
    return (jnp.broadcast_to(jnp.asarray(cam), (n, 3)),
            jnp.asarray(d), jnp.full((n,), 1e30, jnp.float32))


for name, view, order in (('A raster/grazing', 'grazing', 'raster'),
                          ('B raster/topdown', 'topdown', 'raster'),
                          ('C tiled/topdown', 'topdown', 'tiled'),
                          ('D tiled/grazing', 'grazing', 'tiled')):
    org, dirn, tmax = rays(view, order)
    ids, count, keys = cluster_cull(cm, org, dirn, tmax)
    c = np.asarray(count)[:, 0]
    t, tri, al, be = two_level_hit(cm, org, dirn, tmax)   # compile+run
    t.block_until_ready()
    t0 = time.perf_counter()
    t, tri, al, be = two_level_hit(cm, org, dirn, tmax)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    hit = float((np.asarray(t) < 1e29).mean())
    print(f'{name}: slots med {int(np.median(c))} max {c.max()} '
          f'over {(c > MAXC).sum()}/{len(c)} | {dt*1e3:.0f}ms '
          f'-> {n/dt/1e6:.2f}M rays/s (hit {hit:.2f})', flush=True)
