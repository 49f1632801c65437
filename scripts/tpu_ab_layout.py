"""A/B the cluster LAYOUT on the 2.4M-tri closed sphere (round-4 #1b).

Variants: uniform (fixed contiguous TRIS_C chunks of the BVH order,
rounds 1-3) vs subtree (maximal BVH subtrees <= tris_c + greedy SAH
merge).  Measures, with honest device_sync timing:
  * primaries (tile-major 1080p) — two_level_hit wall + slots/packet;
  * bounce-like ESCAPING rays (cosine hemisphere off the first hits,
    sorted by (octant, cluster) like the integrator) — the round-3 e2e
    dominator: rays that hit nothing but sweep shell clusters;
  * shadow rays (hit points -> light) through two_level_any.

Run under `timeout`; kill the exact PID if it hangs (CLAUDE.md).
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
LIGHT = np.array([10.0, 23.0, 15.0], np.float32)


def log(*a):
    print(*a, flush=True)


def timed(fn, label, reps=3):
    out = fn()
    device_sync(out)                      # compile+warm
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    log(f'  {label}: {best * 1e3:.1f} ms')
    return out, best


def cull_stats(cm, org, dirn, tmax, label):
    ids, cnt, keys = pc.cluster_cull(cm, org, dirn, tmax)
    cnt = np.asarray(cnt)[:, 0]
    emitted = np.asarray((jnp.asarray(ids) >= 0).sum(axis=1))
    log(f'  {label}: slots/packet med {np.median(emitted):.0f} '
        f'mean {emitted.mean():.1f} max {emitted.max()} '
        f'overflow {np.mean(cnt > pc.MAXC) * 100:.1f}%')


def main():
    log('devices:', jax.devices())
    md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
    tri = (md.vertices[md.vtx_idx]).astype(np.float32)
    tri = tri + np.array([0.0, -15.0, 0.0], np.float32)
    log('tris:', tri.shape[0])
    fb = bvh_mod.build_bvh(tri)

    # ---- rays (shared) ----
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    pix_i, pix_j, _ = rnd._pixel_order(W, H, 32)
    org_p, dir_p = cam_mod.generate_rays(
        cam, pix_i, pix_j, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
        jnp.zeros(()), W, H)
    n = org_p.shape[0]
    tmax = jnp.full((n,), np.float32(1e30))

    variants = [
        ('uniform', dict(layout='uniform')),
        ('subtree', dict(layout='subtree', merge_factor=1.25)),
        ('subtree-nomerge', dict(layout='subtree', merge_factor=0)),
    ]
    results = {}
    bounce_rays = None
    for name, kw in (variants if len(sys.argv) < 2
                     else [v for v in variants if v[0] in sys.argv[1:]]):
        t0 = time.perf_counter()
        cm = pc.build_clustered(tri, fb=fb, **kw)
        device_sync(cm.packed)
        occ = tri.shape[0] / (cm.n_clusters
                              * (cm.packed.shape[2] - pc.TAIL)
                              // (3 * pc.SUBT + pc.SUB_META) / 6 * 6)
        tris_c = ((cm.packed.shape[2] - pc.TAIL)
                  // (3 * pc.SUBT + pc.SUB_META)) * pc.SUBT
        log(f'[{name}] clusters {cm.n_clusters} tris_c {tris_c} '
            f'occupancy {tri.shape[0] / (cm.n_clusters * tris_c):.2f} '
            f'packed {cm.packed.nbytes / 1e9:.2f} GB '
            f'(build {time.perf_counter() - t0:.1f}s)')

        cull_stats(cm, org_p, dir_p, tmax, 'primary cull')
        (hit, best) = timed(
            lambda: pc.two_level_hit(cm, org_p, dir_p, tmax,
                                     with_bary=False),
            'primaries two_level_hit')
        t_h, tri_h = hit[0], hit[1]
        hits = np.asarray(tri_h >= 0)
        log(f'  primaries: {hits.mean() * 100:.1f}% hit, '
            f'{n / best / 1e6:.1f}M rays/s')

        if bounce_rays is None:
            # build ESCAPING bounce rays once (identical across variants;
            # tri ids are global BVH positions in every layout)
            soup = pc.flat_soup(cm)
            i = jnp.maximum(tri_h, 0)
            nx, ny, nz = soup.nx[i], soup.ny[i], soup.nz[i]
            nrm = jnp.stack([nx, ny, nz], -1)
            nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
            # face the incoming ray (outward)
            flip = jnp.sum(nrm * dir_p, -1, keepdims=True) > 0
            nrm = jnp.where(flip, -nrm, nrm)
            p = org_p + t_h[:, None] * dir_p + 1e-3 * nrm
            rng = np.random.default_rng(7)
            u1 = jnp.asarray(rng.random(n, np.float32))
            u2 = jnp.asarray(rng.random(n, np.float32))
            r = jnp.sqrt(u1)
            phi = 2 * np.pi * u2
            lx, ly = r * jnp.cos(phi), r * jnp.sin(phi)
            lz = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
            up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                           jnp.asarray([[0.0, 0.0, 1.0]]),
                           jnp.asarray([[1.0, 0.0, 0.0]]))
            tg = jnp.cross(up, nrm)
            tg = tg / jnp.linalg.norm(tg, axis=-1, keepdims=True)
            bt = jnp.cross(nrm, tg)
            d2 = (lx[:, None] * tg + ly[:, None] * bt + lz[:, None] * nrm)
            live = hits
            # (octant, cluster-of-origin) sort like the integrator
            octant = ((d2[:, 0] > 0).astype(jnp.int32) * 4
                      + (d2[:, 1] > 0).astype(jnp.int32) * 2
                      + (d2[:, 2] > 0).astype(jnp.int32))
            ckey = jnp.minimum(jnp.maximum(tri_h, 0) // 512, 8191)
            key = jnp.where(jnp.asarray(live), octant * 8192 + ckey,
                            1 << 30)
            ord_ = jnp.argsort(key)
            nb_live = int(np.asarray(live).sum())
            p_s = p[ord_]
            d_s = d2[ord_]
            tx_s = jnp.where(jnp.arange(n) < nb_live,
                             np.float32(1e30), np.float32(-1.0))
            # shadow rays: hit point -> light center
            lvec = jnp.asarray(LIGHT)[None, :] - p_s
            ldist = jnp.linalg.norm(lvec, axis=-1)
            ldir = lvec / ldist[:, None]
            bounce_rays = (p_s, d_s, tx_s, ldir,
                           jnp.where(tx_s > 0, ldist, -1.0), nb_live)

        p_s, d_s, tx_s, ldir, ldist, nb_live = bounce_rays
        cull_stats(cm, p_s, d_s, tx_s, 'bounce cull ')
        _, best_b = timed(
            lambda: pc.two_level_hit(cm, p_s, d_s, tx_s, with_bary=False),
            'bounce two_level_hit')
        log(f'  bounce: {nb_live} live, {nb_live / best_b / 1e6:.1f}M '
            f'live rays/s')
        _, best_s = timed(
            lambda: pc.two_level_any(cm, p_s, ldir, ldist),
            'shadow two_level_any')
        log(f'  shadow: {nb_live / best_s / 1e6:.1f}M live rays/s')
        results[name] = (best, best_b, best_s)
        del cm

    log('\nsummary (ms: primary / bounce / shadow):')
    for name, (a, b, c) in results.items():
        log(f'  {name:<18} {a * 1e3:8.1f} {b * 1e3:8.1f} {c * 1e3:8.1f}')


if __name__ == '__main__':
    main()
