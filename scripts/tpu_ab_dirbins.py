"""A/B direction-bin granularity for the bounce-ray sort (round 4).

Round-4 profile (scripts/tpu_bounce_phases.py): incoherent bounce
packets saturate MAXC (~92-128 exact slots/packet) because a 512-lane
packet's direction spread covers a huge shell cap — the frustum is the
cost, not the windowed machinery (escaping rays saved only 3% once the
exact-candidate fix landed).  Hypothesis: finer direction bins (cube
face + KxK grid on the face => ~28-degree cones at K=4) tighten packet
frusta and cut slots/packet.  This script sorts the SAME 2.4M-tri
bounce-ray population under several keys and times the full
two_level_hit (the decision metric), plus exact slots/packet stats from
one _hier_cull chunk.

Sort keys (all (dirbin << 13) | start-cluster, dead lanes last):
  oct      8 bins: sign octant (current integrator key)
  face6   6 bins: dominant axis + sign
  f4x4    96 bins: face + 4x4 grid of the two minor axes
  f8x8    384 bins: face + 8x8 grid
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


md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
tri = (md.vertices[md.vtx_idx] + np.array([0., -15., 0.], np.float32))
fb = bvh_mod.build_bvh(tri)
cm = pc.build_clustered(tri, fb=fb)
log('tris', tri.shape[0], 'clusters', cm.n_clusters, 'BLOCK', pc.BLOCK)

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
live = jnp.asarray(tri_h >= 0)
nb_live = int(np.asarray(live).sum())
log('live bounce rays:', nb_live)
ckey = jnp.minimum(jnp.maximum(tri_h, 0) // pc.TRIS_C, 8191)


def bin_oct(d):
    return ((d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32)), 8


def bin_face(d):
    ax = jnp.argmax(jnp.abs(d), axis=1).astype(jnp.int32)
    sg = (jnp.take_along_axis(d, ax[:, None], 1)[:, 0] > 0)
    return ax * 2 + sg.astype(jnp.int32), 6


def bin_grid(d, k):
    ax = jnp.argmax(jnp.abs(d), axis=1).astype(jnp.int32)
    m = jnp.take_along_axis(d, ax[:, None], 1)[:, 0]
    face = ax * 2 + (m > 0).astype(jnp.int32)
    # the two minor axes, projected to the face at |m| (gnomonic), in
    # a fixed (axis+1, axis+2) mod 3 order
    a1 = (ax + 1) % 3
    a2 = (ax + 2) % 3
    u = jnp.take_along_axis(d, a1[:, None], 1)[:, 0] / jnp.abs(m)
    v = jnp.take_along_axis(d, a2[:, None], 1)[:, 0] / jnp.abs(m)
    gu = jnp.clip(((u + 1) * (k / 2)).astype(jnp.int32), 0, k - 1)
    gv = jnp.clip(((v + 1) * (k / 2)).astype(jnp.int32), 0, k - 1)
    return face * k * k + gu * k + gv, 6 * k * k


VARIANTS = [
    ('oct', lambda d: bin_oct(d)),
    ('face6', lambda d: bin_face(d)),
    ('f4x4', lambda d: bin_grid(d, 4)),
    ('f8x8', lambda d: bin_grid(d, 8)),
]

for name, fn in VARIANTS:
    b, nb = fn(d2)
    key = jnp.where(live, b * 8192 + ckey, np.int32(nb) << 13)
    ord_ = jnp.argsort(key, stable=True)
    p_s, d_s = p[ord_], d2[ord_]
    tx_s = jnp.where(jnp.arange(n) < nb_live, np.float32(1e30),
                     np.float32(-1.0))
    device_sync((p_s, d_s))

    # slots/packet stats on the first live chunk
    nc = pc.CHUNK_PACKETS * pc.BLOCK
    txc = pc.root_exit_clamp(cm, p_s[:nc], d_s[:nc], tx_s[:nc])
    cb = (cm.cb_lox, cm.cb_loy, cm.cb_loz, cm.cb_hix, cm.cb_hiy, cm.cb_hiz)
    ids, cnt, keys, cand = pc._hier_cull(cb, p_s[:nc], d_s[:nc], txc)
    cntn = np.asarray(cnt)[:, 0]
    em = np.asarray((ids >= 0).sum(axis=1))
    lp = cntn > 0
    log(f'{name}: exact slots/live-packet med {np.median(em[lp]):.0f} '
        f'mean {em[lp].mean():.1f} max {em[lp].max()}; '
        f'overflow {np.mean(cntn[lp] > pc.MAXC) * 100:.1f}%')
    _, t_full = timed(
        lambda: pc.two_level_hit(cm, p_s, d_s, tx_s, with_bary=False),
        f'{name}: FULL two_level_hit (all rays)')
    log(f'  {name}: {nb_live / t_full / 1e6:.2f}M live rays/s')
