"""On-device mesh-scene benchmarks (VERDICT #1: measure configs 2/3-class).

Stages (pass as argv, default 'packet'):
  packet   — config-2 class: ~2k-tri mesh (lion-scale), full renderer at
             1080p, measured rays/s with live-lane accounting.
  cluster  — raw two_level_hit on a CLOSED ~2.4M-tri displaced sphere
             (bot-scale) at 1080p primary rays + cull statistics, plus the
             open-terrain worst case for contrast.
  render   — full renderer on the 2.4M-tri scene (hit + shadow per bounce).

Run under `timeout`; kill the exact PID if it hangs (CLAUDE.md wedge
recovery).  Every stage asserts real hits (non-vacuous, see memory note).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

import pathtracer_tpu as pt
from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen

W, H = 1920, 1080


def log(*a):
    print(*a, flush=True)


def build_mesh_scene(md, translation=(0.0, -15.0, 0.0)):
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, translation=translation))
    return scn.build_scene(objs, scn.default_light_intensity())


def bench_render(sc, label, spp_warm=2, spp_bench=4, bounces=3,
                 compact=True):
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=64, nb_bounces=bounces,
                           samples_per_wave=spp_warm,
                           compact_rays=compact)
    r = rnd.Renderer(sc, cam, cfg)
    log(f'[{label}] compile + warmup ({spp_warm} spp)...')
    t0 = time.perf_counter()
    r.step(spp_warm)
    device_sync(r.image)
    log(f'[{label}] warmup {time.perf_counter() - t0:.1f}s')

    # BEST-OF-3 windows: a single window eats the tunnel's multi-100ms
    # dispatch jitter — measured 3.1 vs 2.2s on the SAME 2.4M 2-spp wave
    # (round 5); exact per-spp ray scaling via samples_done (the
    # round-4 (done+warm) divisor was wrong once reps > 1)
    dt = float('inf')
    done = 0
    for _ in range(3):
        t0 = time.perf_counter()
        done = 0
        while done < spp_bench:
            r.step(spp_warm)
            done += spp_warm
        device_sync(r.image)
        dt = min(dt, time.perf_counter() - t0)
    st = r.stats(dt)
    rps = st['rays_traced'] * done / r.samples_done / dt
    log(f'[{label}] {done} spp in {dt:.2f}s -> {rps / 1e6:.1f}M live '
        f'rays/s (rays/spp {st["rays_traced"] / r.samples_done / 1e6:.1f}M)')
    img = np.asarray(r.display())
    assert np.isfinite(img).all()
    mid = img[H // 3:2 * H // 3, W // 3:2 * W // 3]
    log(f'[{label}] center mean {mid.mean():.4f} (nonzero sanity '
        f'{(mid.sum(-1) > 0).mean():.3f})')
    return rps


def primary_rays(tile=32):
    """Tile-major primary rays — the renderer's packet ordering (a raster
    1080p 'packet' is a 1024px-wide strip that enters 40-70 clusters;
    ~32x32 tiles enter ~8)."""
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    from pathtracer_tpu.core import camera as cam_mod
    pix_i, pix_j, _ = rnd._pixel_order(W, H, tile)
    org, dirn = cam_mod.generate_rays(
        cam, pix_i, pix_j,
        jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), W, H)
    return org, dirn


def stage_packet():
    md = procgen.sphere_mesh(32, 32, radius=12.0, displace_amp=0.25)
    log('packet-tier mesh tris:', md.num_triangles)
    t0 = time.perf_counter()
    sc = build_mesh_scene(md)
    m = sc.meshes[0]
    log(f'upload {time.perf_counter() - t0:.1f}s  use_packet={m.use_packet} '
        f'use_cluster={m.use_cluster} use_brute={m.use_brute}')
    bench_render(sc, 'packet-2k')


def _terrain_rays(n, grazing=False):
    """Rays for the terrain case: top-down all-hit view, or the open-sky
    grazing worst case (near-horizontal over the ridges)."""
    side = int(np.sqrt(n))
    xs = np.linspace(-19.0, 19.0, side)
    zs = np.linspace(-19.0, 19.0, side)
    gx, gz = np.meshgrid(xs, zs)
    m = side * side
    if grazing:
        org = np.stack([np.full(m, -25.0), np.full(m, 2.0),
                        gz.ravel()], -1)
        d = np.stack([np.ones(m), np.linspace(-0.08, 0.04, m),
                      np.zeros(m)], -1)
    else:
        # tile-major order like the renderer feeds the kernels
        pi, pj, _ = rnd._pixel_order(side, side, 32)
        pi, pj = np.asarray(pi), np.asarray(pj)
        org = np.stack([gx[pi, pj], np.full(m, 30.0), gz[pi, pj]], -1)
        d = np.stack([np.zeros(m), -np.ones(m), np.zeros(m)], -1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32))


def stage_cluster():
    from pathtracer_tpu.ops import pallas_cluster as pc
    for name, md in [
        ('closed-sphere-2.4M',
         procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)),
        ('terrain-1M', procgen.terrain_mesh(708, extent=20.0)),
        ('terrain-1M-grazing', None),
    ]:
        if md is not None:
            tri = md.vertices[md.vtx_idx]
            log(f'[{name}] tris {tri.shape[0]}')
            t0 = time.perf_counter()
            cm = pc.build_clustered(tri)
            device_sync(cm.packed)
            log(f'[{name}] build+upload {time.perf_counter() - t0:.1f}s, '
                f'{cm.n_clusters} clusters')

        if name.startswith('closed'):
            org, dirn = primary_rays()
            org = org - jnp.asarray([0.0, -15.0, 0.0])   # mesh-local frame
        else:
            org, dirn = _terrain_rays(W * H, grazing=name.endswith('grazing'))
        tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)

        ids, count, keys = pc.cluster_cull(cm, org, dirn, tmax)
        c = np.asarray(count)[:, 0]
        log(f'[{name}] clusters/packet min {c.min()} med '
            f'{int(np.median(c))} max {c.max()} '
            f'overflow {(c > pc.MAXC).sum()}/{len(c)}')

        t0 = time.perf_counter()
        t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
        device_sync(t)
        log(f'[{name}] first hit call {time.perf_counter() - t0:.1f}s')
        hit = float((np.asarray(t) < 1e29).mean())
        log(f'[{name}] hit fraction {hit:.3f}')
        assert hit > (0.01 if name.endswith('grazing') else 0.1), \
            'vacuous bench: mesh not in frame'
        for rep in range(3):
            t0 = time.perf_counter()
            t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
            device_sync(t)
            dt = time.perf_counter() - t0
            log(f'[{name}] rep{rep}: {dt:.3f}s -> '
                f'{org.shape[0] / dt / 1e6:.2f}M rays/s')


def stage_render():
    md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
    log('cluster-tier mesh tris:', md.num_triangles)
    t0 = time.perf_counter()
    sc = build_mesh_scene(md)
    m = sc.meshes[0]
    log(f'upload {time.perf_counter() - t0:.1f}s use_cluster={m.use_cluster} '
        f'n_clusters={m.n_clusters}')
    bench_render(sc, 'cluster-2.4M', spp_warm=1, spp_bench=2)


def stage_big():
    """VERDICT #2: >=8M triangles on one chip.  8M forces tris_c
    auto-doubling (15625 clusters at 512 -> 7813 at 1024, inside the
    dense cull) and a ~1.7GB packed upload."""
    from pathtracer_tpu.ops import pallas_cluster as pc
    md = procgen.sphere_mesh(2001, 2001, radius=14.0, displace_amp=0.25)
    tri = md.vertices[md.vtx_idx]
    log('big mesh tris:', tri.shape[0])
    t0 = time.perf_counter()
    cm = pc.build_clustered(tri)
    log(f'host build {time.perf_counter() - t0:.1f}s, {cm.n_clusters} '
        f'clusters, packed {cm.packed.nbytes / 1e9:.2f} GB')
    device_sync(cm.packed)
    log(f'build+upload total {time.perf_counter() - t0:.1f}s')

    org, dirn = primary_rays()
    org = org - jnp.asarray([0.0, -15.0, 0.0])
    tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)
    t0 = time.perf_counter()
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
    device_sync(t)
    log(f'first hit call {time.perf_counter() - t0:.1f}s')
    hit = float((np.asarray(t) < 1e29).mean())
    log(f'hit fraction {hit:.3f}')
    assert hit > 0.1, 'vacuous: mesh not in frame'
    for rep in range(3):
        t0 = time.perf_counter()
        t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
        device_sync(t)
        dt = time.perf_counter() - t0
        log(f'rep{rep}: {dt:.3f}s -> {org.shape[0] / dt / 1e6:.2f}M rays/s')


def stage_office():
    """Config-5 scale: 23.7M triangles (antiqueOffice, reference
    README.md:70) on ONE chip.  tris_c auto-doubles 512->4096 (~5.8k
    clusters, inside the dense cull); packed A-matrices ~5GB of the
    16GB HBM.  The per-subtile AABB skip is what makes 4096-tri
    clusters affordable: a packet clipping a cluster corner sweeps a
    couple of its 16 subtiles."""
    from pathtracer_tpu.ops import pallas_cluster as pc
    md = procgen.sphere_mesh(3445, 3445, radius=14.0, displace_amp=0.25)
    tri = md.vertices[md.vtx_idx]
    log('office-scale mesh tris:', tri.shape[0])
    t0 = time.perf_counter()
    cm = pc.build_clustered(tri)
    log(f'host build {time.perf_counter() - t0:.1f}s, {cm.n_clusters} '
        f'clusters, packed {cm.packed.nbytes / 1e9:.2f} GB')
    device_sync(cm.packed)
    log(f'build+upload total {time.perf_counter() - t0:.1f}s')

    org, dirn = primary_rays()
    org = org - jnp.asarray([0.0, -15.0, 0.0])
    tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)
    t0 = time.perf_counter()
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
    device_sync(t)
    log(f'first hit call {time.perf_counter() - t0:.1f}s')
    hit = float((np.asarray(t) < 1e29).mean())
    log(f'hit fraction {hit:.3f}')
    assert hit > 0.1, 'vacuous: mesh not in frame'
    for rep in range(3):
        t0 = time.perf_counter()
        t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax)
        device_sync(t)
        dt = time.perf_counter() - t0
        log(f'rep{rep}: {dt:.3f}s -> {org.shape[0] / dt / 1e6:.2f}M rays/s')


def stage_routed():
    """A/B: routed_hit (per-lane ray->cluster sweeps + seal) vs
    two_level_hit on 1080p primaries over the closed 2.4M-tri sphere
    and the 1M-tri terrain."""
    from pathtracer_tpu.ops import pallas_cluster as pc
    from pathtracer_tpu.ops import routed_cluster as rc

    scenes = []
    md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
    scenes.append(('sphere2.4M', md, (0.0, -15.0, 0.0)))
    md2 = procgen.terrain_mesh(708, extent=40.0)
    scenes.append(('terrain1M', md2, (0.0, -10.0, 0.0)))

    for name, md, tr in scenes:
        tri = md.vertices[md.vtx_idx]
        log(f'[{name}] tris {tri.shape[0]}')
        cm = pc.build_clustered(tri)
        device_sync(cm.packed)
        org, dirn = primary_rays()
        org = org - jnp.asarray(tr)
        tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)

        for label, fn in (('two_level', pc.two_level_hit),
                          ('routed', rc.routed_hit)):
            t, tid, al, be = fn(cm, org, dirn, tmax)
            device_sync(t)
            hit = float((np.asarray(t) < 1e29).mean())
            best = 1e30
            for rep in range(3):
                t0 = time.perf_counter()
                t, tid, al, be = fn(cm, org, dirn, tmax)
                device_sync(t)
                best = min(best, time.perf_counter() - t0)
            log(f'[{name}] {label}: hit {hit:.3f} best {best:.3f}s -> '
                f'{org.shape[0] / best / 1e6:.2f}M rays/s')
        # cross-check the two paths agree
        t_a = np.asarray(pc.two_level_hit(cm, org, dirn, tmax)[0])
        t_b = np.asarray(rc.routed_hit(cm, org, dirn, tmax)[0])
        log(f'[{name}] max|dt| {np.abs(t_a - t_b).max():.2e}')


def stage_office_e2e():
    """Config-5 capability: 23.7M triangles END-TO-END through the full
    renderer (closest + NEE shadow per bounce, compaction + sort) at
    1080p.  Memory (round 4, compact layout + LEAN upload): packed
    A-matrices ~2.3GB + shade_pack (normals + bary rows) ~2.1GB and
    nothing else — soup/BVH/attribute duplicates are dropped by the
    lean tier (scene/mesh.py), down from ~11GB in round 3."""
    md = procgen.sphere_mesh(3445, 3445, radius=14.0, displace_amp=0.25)
    log('office-scale mesh tris:', md.num_triangles)
    t0 = time.perf_counter()
    sc = build_mesh_scene(md)
    m = sc.meshes[0]
    log(f'upload {time.perf_counter() - t0:.1f}s use_cluster={m.use_cluster} '
        f'n_clusters={m.n_clusters}')
    bench_render(sc, 'office-23.7M', spp_warm=1, spp_bench=2)


if __name__ == '__main__':
    stage = sys.argv[1] if len(sys.argv) > 1 else 'packet'
    log('devices:', jax.devices())
    {'packet': stage_packet, 'cluster': stage_cluster,
     'render': stage_render, 'big': stage_big,
     'office': stage_office, 'office-e2e': stage_office_e2e,
     'routed': stage_routed}[stage]()
