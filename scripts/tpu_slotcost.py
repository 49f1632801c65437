"""Isolate the sweep's per-packet fixed cost vs per-slot cost.

Runs cluster_sweep on the 1M-tri terrain (tiled topdown view) with counts
clamped to K = 0,1,2,4,8,16 — the time-vs-K line gives fixed + slope.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas_cluster import (
    build_clustered, cluster_cull, cluster_sweep, BLOCK, MAXC)

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
cm = build_clustered(tris)
print('tris:', tris.shape[0], 'clusters:', cm.n_clusters, flush=True)

H, W = 1080, 1920
n = H * W
ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
cam = np.array([0.0, 60.0, 0.0], np.float32)
d = np.stack([(jj - W / 2) / W * 0.55,
              -np.ones_like(ii).astype(np.float32),
              (ii - H / 2) / H * 0.3], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
TS = 32
Hc = (H // TS) * TS
d = (d[:Hc].reshape(Hc // TS, TS, W // TS, TS, 3)
     .transpose(0, 2, 1, 3, 4).reshape(-1, 3))
d = np.concatenate([d, d[:n - len(d)]], 0)
org = jnp.broadcast_to(jnp.asarray(cam), (n, 3))
dirn = jnp.asarray(d)
tmax = jnp.full((n,), 1e30, jnp.float32)
tmin = jnp.full((n,), -1.0, jnp.float32)

ids, count, keys = cluster_cull(cm, org, dirn, tmax)
c_all = np.asarray(count)[:, 0]
print(f'true slots: mean {c_all.mean():.1f} med {int(np.median(c_all))} '
      f'max {c_all.max()}', flush=True)
# slice to 512 packets (direct cluster_sweep calls skip two_level_hit's
# SMEM chunking)
nb = 512
m = nb * BLOCK
ids, count, keys = ids[:nb], count[:nb], keys[:nb]
org, dirn, tmax, tmin = org[:m], dirn[:m], tmax[:m], tmin[:m]
c = c_all[:nb]
# break disabled (keys=0) so exactly K slots run
keys0 = jnp.zeros_like(keys)

prev = None
for K in (0, 1, 2, 4, 8, 16):
    ck = jnp.minimum(count, K)
    t, tri, al, be = cluster_sweep(ids, ck, keys0, cm.packed,
                                   org, dirn, tmax, tmin)
    t.block_until_ready()
    t0 = time.perf_counter()
    t, tri, al, be = cluster_sweep(ids, ck, keys0, cm.packed,
                                   org, dirn, tmax, tmin)
    t.block_until_ready()
    dt = time.perf_counter() - t0
    slots = int(np.minimum(c, K).sum())
    extra = ''
    if prev is not None and slots > prev[1]:
        extra = f'  (slope {1e6*(dt-prev[0])/(slots-prev[1]):.1f}us/slot)'
    print(f'K={K:3d}: {dt*1e3:7.1f}ms total, {slots} slots, '
          f'{dt/nb*1e6:.0f}us/packet{extra}', flush=True)
    prev = (dt, slots)

# --- wrapper vs manual on the same slice ---
from pathtracer_tpu.ops.pallas_cluster import two_level_hit
t, _, _, _ = two_level_hit(cm, org, dirn, tmax)
t.block_until_ready()
t0 = time.perf_counter()
t, _, _, _ = two_level_hit(cm, org, dirn, tmax)
t.block_until_ready()
print(f'two_level_hit (512 packets): {(time.perf_counter()-t0)*1e3:.1f}ms',
      flush=True)

t2, _, _, _ = cluster_sweep(ids, count, keys, cm.packed, org, dirn,
                            tmax, tmin)
t2.block_until_ready()
t0 = time.perf_counter()
t2, _, _, _ = cluster_sweep(ids, count, keys, cm.packed, org, dirn,
                            tmax, tmin)
t2.block_until_ready()
print(f'manual sweep true counts+keys: {(time.perf_counter()-t0)*1e3:.1f}ms',
      flush=True)
print('agree:', bool(jnp.all(t == t2)), flush=True)
