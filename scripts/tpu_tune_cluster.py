"""Cluster-tier parameter tuning on device (round-2 perf work).

Usage: python scripts/tpu_tune_cluster.py [BLOCK] [TRIS_C] [SUBT] [MAXC]

Builds a ~1M-tri CLOSED displaced sphere (config-2/3 shape class), shoots
1080p primary rays at it, and times phase 1 (cluster cull) and phase 2
(sweep) separately, plus slot-count statistics — the numbers that decide
the BLOCK/TRIS_C/SUBT design point.  Run each combo as its own process so
a wedged device only loses one point.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.utils import procgen

if len(sys.argv) > 1:
    pc.BLOCK = int(sys.argv[1])
if len(sys.argv) > 2:
    pc.TRIS_C = int(sys.argv[2])
if len(sys.argv) > 3:
    pc.SUBT = int(sys.argv[3])
if len(sys.argv) > 4:
    pc.MAXC = int(sys.argv[4])

W, H = 1920, 1080


def log(*a):
    print(*a, flush=True)


def main():
    log('devices:', jax.devices())
    log(f'BLOCK={pc.BLOCK} TRIS_C={pc.TRIS_C} SUBT={pc.SUBT} MAXC={pc.MAXC}')
    md = procgen.sphere_mesh(708, 708, radius=14.0, displace_amp=0.25)
    tri = md.vertices[md.vtx_idx]
    log('tris', tri.shape[0])
    t0 = time.perf_counter()
    cm = pc.build_clustered(tri)
    jax.block_until_ready(cm.packed)
    log(f'build+upload {time.perf_counter() - t0:.1f}s, '
        f'{cm.n_clusters} clusters')

    import pathtracer_tpu as pt
    from pathtracer_tpu.core import camera as cam_mod
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    ii, jj = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                          jnp.arange(W, dtype=jnp.int32), indexing='ij')
    org, dirn = cam_mod.generate_rays(
        cam, ii.reshape(-1), jj.reshape(-1),
        jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), W, H)
    org = org - jnp.asarray([0.0, -15.0, 0.0])
    n = org.shape[0]
    pad = (-n) % pc.BLOCK
    if pad:
        org, dirn, _, _ = pc._pad_rays(
            org, dirn, jnp.full((n,), 1e30, jnp.float32), None, n + pad)
        org = org[:n + pad]
    tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)

    # phase 1 alone
    ids, count, keys = pc.cluster_cull(cm, org, dirn, tmax)
    jax.block_until_ready(ids)
    for rep in range(3):
        t0 = time.perf_counter()
        ids, count, keys = pc.cluster_cull(cm, org, dirn, tmax)
        jax.block_until_ready(ids)
        log(f'cull rep{rep}: {time.perf_counter() - t0:.3f}s')
    c = np.asarray(count)[:, 0]
    log(f'slots/packet min {c.min()} med {int(np.median(c))} '
        f'mean {c.mean():.1f} p90 {int(np.percentile(c, 90))} max {c.max()} '
        f'overflow {(c > pc.MAXC).sum()}/{len(c)}')

    # full two-level (cull + sweep + refine)
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
    t.block_until_ready()
    hit = float((np.asarray(t) < 1e29).mean())
    log(f'hit fraction {hit:.3f}')
    for rep in range(3):
        t0 = time.perf_counter()
        t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
        t.block_until_ready()
        dt = time.perf_counter() - t0
        log(f'two_level rep{rep}: {dt:.3f}s -> '
            f'{org.shape[0] / dt / 1e6:.2f}M rays/s')


if __name__ == '__main__':
    main()
