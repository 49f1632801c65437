"""Isolate the mesh attribute-fetch cost + re-measure the e2e wave.

Theory from the wave trace: ~18 one-shot ~45ms fusions are the per-lane
random gathers of triangle attributes (n0/n1/n2, group, uv) + merge
epilogue after each mesh sweep.  Measures, on the 2.4M-tri scene at
1080p primaries:
  1. raw two_level_hit            (sweep only)
  2. scn.intersect                (sweep + fetch + analytic merge)
  3. e2e renderer wave            (after shadow gating + packed sort)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

import pathtracer_tpu as pt
from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.ops import pallas_cluster
from pathtracer_tpu.utils import procgen

W, H = 1920, 1080


def log(*a):
    print(*a, flush=True)


def bench(f, *args, reps=5, warm=1):
    for _ in range(warm):
        out = f(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / reps


md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
objs = scn.default_objects()
objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
sc = scn.build_scene(objs, scn.default_light_intensity())
m = sc.meshes[0]
log('tris:', m.num_triangles, 'clusters:', m.n_clusters)

# tile-major primary rays (the renderer's ordering)
cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
from pathtracer_tpu.core import camera as cam_mod
from pathtracer_tpu.render.renderer import _pixel_order
pix_i, pix_j, _ = _pixel_order(W, H, 32)
z = jnp.zeros(())
org, dirn = cam_mod.generate_rays(cam, pix_i, pix_j, z, z, z, z, W, H)
tmax = jnp.full((W * H,), 1e30, jnp.float32)

cmesh = pallas_cluster.cluster_from_arrays(m.clustered, m.n_clusters,
                                           m.cluster_top_max_leaf)
# two_level_hit jits its whole pipeline internally with the mesh as an
# ARGUMENT (closing over it in an outer jit bakes 1.7GB of constants into
# the HLO -> remote-compile HTTP 413)
raw = lambda o, d, t: pallas_cluster.two_level_hit(cmesh, o, d, t,
                                                   refine_rounds=1)[0]
t_raw = bench(raw, org, dirn, tmax)
log(f'raw two_level_hit:   {t_raw:.3f}s  ({W*H/t_raw/1e6:.2f}M rays/s)')

inter = jax.jit(lambda s, o, d: scn.intersect(s, o, d).t)
t_int = bench(inter, sc, org, dirn)
log(f'scn.intersect:       {t_int:.3f}s  ({W*H/t_int/1e6:.2f}M rays/s)  '
    f'fetch+merge overhead {t_int - t_raw:.3f}s')

shadow = jax.jit(lambda s, o, d, dl: scn.intersect_shadow(s, o, d, dl))
dl = jnp.full((W * H,), 30.0, jnp.float32)
t_sh = bench(shadow, sc, org, dirn, dl)
log(f'scn.intersect_shadow:{t_sh:.3f}s  ({W*H/t_sh/1e6:.2f}M rays/s)')

cfg = rnd.RenderConfig(width=W, height=H, nrays=64, nb_bounces=3,
                       samples_per_wave=1, compact_rays=True)
r = rnd.Renderer(sc, cam, cfg)
log('wave compile...')
t0 = time.perf_counter()
r.step(1)
device_sync(r.image)
log(f'warmup {time.perf_counter() - t0:.1f}s')
t0 = time.perf_counter()
for _ in range(3):
    r.step(1)
device_sync(r.image)
wave = (time.perf_counter() - t0) / 3
st = r.stats(1.0)
rays_per_wave = st['rays_traced'] / 4
log(f'e2e wave: {wave:.2f}s   ({rays_per_wave / wave / 1e6:.2f}M live '
    f'rays/s; was 4.85s / 1.18M before shadow gating + packed sort)')
