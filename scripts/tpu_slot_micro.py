"""Honest micro-costs of the cluster pipeline: fixed/packet, cull, slots.

Run AFTER the honest-sync fix (device_sync).  Cases:
  sky      — 1080p packets, zero emitted slots (fixed per-packet floor)
  cull     — _dense_cull alone at the 2.4M-tri mesh's cluster count
  sweep1   — all packets forced to exactly 1 slot
  sweep4   — all packets forced to 4 slots
  e2e      — two_level_hit full (reference point)
"""
import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.utils import procgen

W, H = 1920, 1080
N = W * H


def timeit(fn, *a):
    out = fn(*a); device_sync(out)
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter(); out = fn(*a); device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
tri = md.vertices[md.vtx_idx]
cm = pc.build_clustered(tri)
device_sync(cm.packed)
print('tris', tri.shape[0], 'clusters', cm.n_clusters, 'tris_c',
      (cm.packed.shape[2] - pc.TAIL) // (3 * pc.SUBT + pc.SUB_META) * pc.SUBT,
      flush=True)

nb = N // pc.BLOCK
# direct cluster_sweep calls must stay inside one CHUNK_PACKETS launch
NS = pc.CHUNK_PACKETS * pc.BLOCK
nbs = pc.CHUNK_PACKETS
# sky rays: pointing away from the mesh -> cull emits nothing
org = jnp.broadcast_to(jnp.asarray([0.0, 50.0, 0.0]), (N, 3))
dirn = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (N, 3))
tmax = jnp.full((N,), 1e30, jnp.float32)
tmin = jnp.full((NS,), -1.0, jnp.float32)

dt, out = timeit(pc.two_level_hit, cm, org, dirn, tmax)
print(f'sky two_level: {dt*1e3:.1f}ms -> {dt/nb*1e6:.1f}us/packet '
      f'(hit {(np.asarray(out[0])<1e29).mean():.3f})', flush=True)

# cull alone (2.4M mesh cluster count)
cb = (cm.cb_lox, cm.cb_loy, cm.cb_loz, cm.cb_hix, cm.cb_hiy, cm.cb_hiz)
down = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (N, 3))
org2 = jnp.broadcast_to(jnp.asarray([0.0, 30.0, 0.0]), (N, 3))
dt, (ids, count, keys) = timeit(pc._dense_cull, cb, org2, down, tmax)
print(f'dense_cull {cm.n_clusters}cl: {dt*1e3:.1f}ms -> {dt/nb*1e6:.1f}us/packet',
      flush=True)

# forced slot counts: hand the sweep synthetic id tables
for k in (0, 1, 4):
    ids_k = jnp.broadcast_to(jnp.arange(pc.MAXC, dtype=jnp.int32)[None, :],
                             (nbs, pc.MAXC))
    ids_k = jnp.where(jnp.arange(pc.MAXC)[None, :] < k, ids_k % cm.n_clusters, -1)
    cnt_k = jnp.full((nbs, 1), k, jnp.int32)
    keys_k = jnp.where(jnp.arange(pc.MAXC)[None, :] < k,
                       jnp.zeros((nbs, pc.MAXC)), pc.BIG_T)
    dt, out = timeit(pc.cluster_sweep, ids_k, cnt_k, keys_k, cm.packed,
                     org2[:NS], down[:NS], tmax[:NS], tmin)
    print(f'sweep forced {k} slots: {dt*1e3:.2f}ms -> '
          f'{dt/nbs*1e6:.1f}us/packet '
          f'({dt/nbs/max(k,1)*1e6:.1f}us/slot incl fixed)', flush=True)

# reference: full two_level on real primaries
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.core import camera as cam_mod
import pathtracer_tpu as pt
cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
pix_i, pix_j, _ = rnd._pixel_order(W, H, 32)
porg, pdir = cam_mod.generate_rays(cam, pix_i, pix_j, jnp.zeros(()),
                                   jnp.zeros(()), jnp.zeros(()),
                                   jnp.zeros(()), W, H)
porg = porg - jnp.asarray([0.0, -15.0, 0.0])
dt, out = timeit(pc.two_level_hit, cm, porg, pdir, tmax)
print(f'primaries two_level: {dt*1e3:.1f}ms -> {N/dt/1e6:.2f}M rays/s '
      f'(hit {(np.asarray(out[0])<1e29).mean():.3f})', flush=True)
