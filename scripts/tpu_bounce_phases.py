"""Decompose the bounce-ray two_level_hit cost into phases (round 4).

On the 2.4M-tri closed sphere's ESCAPING bounce rays: time one
_hier_cull, one cluster_sweep of its emission, and the full exhaustive
two_level_hit; report interval-live counts (the windowed-round driver)
vs exact emitted slots.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import numpy as np
import jax
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.utils import procgen
from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops import bvh as bvh_mod
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.core import camera as cam_mod

W, H = 1920, 1080


def log(*a):
    print(*a, flush=True)


def timed(fn, label, reps=3):
    out = fn()
    device_sync(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    log(f'  {label}: {best * 1e3:.1f} ms')
    return out, best


TRIS_C = int(sys.argv[1]) if len(sys.argv) > 1 else pc.TRIS_C

md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
tri = (md.vertices[md.vtx_idx] + np.array([0., -15., 0.], np.float32))
fb = bvh_mod.build_bvh(tri)
cm = pc.build_clustered(tri, fb=fb, tris_c=TRIS_C)
log('tris', tri.shape[0], 'clusters', cm.n_clusters, 'BLOCK', pc.BLOCK,
    'tris_c', TRIS_C)

cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
pix_i, pix_j, _ = rnd._pixel_order(W, H, 32)
org_p, dir_p = cam_mod.generate_rays(
    cam, pix_i, pix_j, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
    jnp.zeros(()), W, H)
n = org_p.shape[0]
tmax = jnp.full((n,), np.float32(1e30))
t_h, tri_h, _, _ = pc.two_level_hit(cm, org_p, dir_p, tmax, with_bary=False)
device_sync(t_h)

soup = pc.flat_soup(cm)
i = jnp.maximum(tri_h, 0)
nrm = jnp.stack([soup.nx[i], soup.ny[i], soup.nz[i]], -1)
nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
nrm = jnp.where(jnp.sum(nrm * dir_p, -1, keepdims=True) > 0, -nrm, nrm)
p = org_p + t_h[:, None] * dir_p + 1e-3 * nrm
rng = np.random.default_rng(7)
u1 = jnp.asarray(rng.random(n, np.float32))
u2 = jnp.asarray(rng.random(n, np.float32))
r = jnp.sqrt(u1)
phi = 2 * np.pi * u2
lz = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9, jnp.asarray([[0., 0., 1.]]),
               jnp.asarray([[1., 0., 0.]]))
tg = jnp.cross(up, nrm)
tg = tg / jnp.linalg.norm(tg, axis=-1, keepdims=True)
bt = jnp.cross(nrm, tg)
d2 = ((r * jnp.cos(phi))[:, None] * tg + (r * jnp.sin(phi))[:, None] * bt
      + lz[:, None] * nrm)
live = np.asarray(tri_h >= 0)
octant = ((d2[:, 0] > 0).astype(jnp.int32) * 4
          + (d2[:, 1] > 0).astype(jnp.int32) * 2
          + (d2[:, 2] > 0).astype(jnp.int32))
ckey = jnp.minimum(jnp.maximum(tri_h, 0) // 512, 8191)
key = jnp.where(jnp.asarray(live), octant * 8192 + ckey, 1 << 30)
ord_ = jnp.argsort(key)
nb_live = int(live.sum())
p_s, d_s = p[ord_], d2[ord_]
tx_s = jnp.where(jnp.arange(n) < nb_live, np.float32(1e30),
                 np.float32(-1.0))
device_sync((p_s, d_s))
log('live bounce rays:', nb_live)

cb = (cm.cb_lox, cm.cb_loy, cm.cb_loz, cm.cb_hix, cm.cb_hiy, cm.cb_hiz)
# restrict to ONE chunk of live rays (cluster_sweep must stay inside the
# CHUNK_PACKETS SMEM budget; two_level_hit chunks internally)
nc = pc.CHUNK_PACKETS * pc.BLOCK
p_s, d_s, tx_s = p_s[:nc], d_s[:nc], tx_s[:nc]
n = nc
nb_live = min(nb_live, nc)
log(f'chunk: {nc} rays ({nb_live} live)')
txc = pc.root_exit_clamp(cm, p_s, d_s, tx_s)

# phase A: one hier cull over the chunk
(ids, cnt, keys, cand), t_cull = timed(
    lambda: pc._hier_cull(cb, p_s, d_s, txc), 'ONE _hier_cull (chunk)')
cntn = np.asarray(cnt)[:, 0]
em = np.asarray((ids >= 0).sum(axis=1))
lp = cntn > 0
log(f'  live packets {lp.sum()}; exact slots/live-packet med '
    f'{np.median(em[lp]):.0f} mean {em[lp].mean():.1f} max {em[lp].max()}; '
    f'count(incl. interval drops)/live-packet med {np.median(cntn[lp]):.0f} '
    f'mean {cntn[lp].mean():.1f} max {cntn[lp].max()}; '
    f'overflow {np.mean(cntn[lp] > pc.MAXC) * 100:.1f}% of live')

# phase B: one sweep of that emission
_, t_sweep = timed(
    lambda: pc.cluster_sweep(ids, cnt, keys, cm.packed, p_s, d_s, txc,
                             jnp.full((n,), -1.0)),
    'ONE cluster_sweep of it')

# full exhaustive
(hit2, t_full) = timed(
    lambda: pc.two_level_hit(cm, p_s, d_s, tx_s, with_bary=False),
    'FULL two_level_hit')
log(f'  -> windows/overflow machinery = '
    f'{(t_full - t_cull - t_sweep) * 1e3:.1f} ms '
    f'({(t_full - t_cull - t_sweep) / t_full * 100:.0f}%)')

# ORACLE ceiling: if every lane's tmax were clamped just above its true
# hit t (miss lanes dead) — the value of a perfect per-lane t cap
t_true, tri_true = hit2[0], hit2[1]
hit_frac = float(np.asarray(tri_true >= 0).mean())
log(f'  bounce hit fraction: {hit_frac * 100:.1f}%')
tx_oracle = jnp.where(tri_true >= 0, t_true * 1.0001, -1.0)
_, t_or = timed(
    lambda: pc.two_level_hit(cm, p_s, d_s, tx_oracle, with_bary=False),
    'ORACLE-capped two_level_hit')
# and: if only ESCAPING (miss) lanes were known dead, hits uncapped
tx_esc = jnp.where(tri_true >= 0, tx_s, -1.0)
_, t_esc = timed(
    lambda: pc.two_level_hit(cm, p_s, d_s, tx_esc, with_bary=False),
    'ESCAPERS-dead two_level_hit')
