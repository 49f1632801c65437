"""Direct stage decomposition of the 2.4M e2e wave (round 5).

Reconstructs one sample wave's ray population per bounce OUTSIDE the
fused jit (same scene, camera, tiling, octant sort) and times each tier
query separately with device_sync: primaries closest, NEE shadow per
bounce, bounce closest on the sorted live set.  The sum approximates the
fused wave; the split tells where the next 2x lives.
"""
import sys; sys.path.insert(0, '/root/repo')
import time
import numpy as np
import jax
import jax.numpy as jnp
import pathtracer_tpu as pt
from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.utils import procgen
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.core import camera as cam_mod, sampling

W, H = 1920, 1080
def log(*a): print(*a, flush=True)
def timed(fn, label, reps=3):
    out = fn(); device_sync(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter(); out = fn(); device_sync(out)
        best = min(best, time.perf_counter() - t0)
    log(f'  {label}: {best*1e3:.0f} ms')
    return out, best

md = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
objs = scn.default_objects()
objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
sc = scn.build_scene(objs, scn.default_light_intensity())
log('tris', md.num_triangles, 'backface', sc.meshes[0].backface_cull)
cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
pix_i, pix_j, _ = rnd._pixel_order(W, H, 32)
z = jnp.zeros(())
org, dirn = cam_mod.generate_rays(cam, pix_i, pix_j, z, z, z, z, W, H)
n = org.shape[0]
total = 0.0

@jax.jit
def closest_(sc, o, d):
    return scn.intersect(sc, o, d)

def closest(o, d):
    return closest_(sc, o, d)

@jax.jit
def shadow_(sc, o, d, p, nrm, hitmask):
    center_light = sc.center_light
    to_l = center_light[None, :] - p
    dl = jnp.sqrt(jnp.sum(to_l**2, -1))
    wi = to_l / dl[:, None]
    lim = jnp.where(hitmask, dl - 0.01, 0.0)
    return scn.intersect_shadow(sc, p + 0.01 * wi, wi, lim)

def shadow(o, d, p, nrm, hitmask):
    return shadow_(sc, o, d, p, nrm, hitmask)

hit, t0 = timed(lambda: closest(org, dirn), 'bounce0 closest (2.07M rays)')
total += t0
live0 = np.asarray(hit.hit & (hit.obj_id >= 2))
log('  live surface lanes after b0:', live0.sum())
p = np.asarray(hit.p); nl = np.asarray(hit.n)
_, ts = timed(lambda: shadow(org, dirn, jnp.asarray(p), jnp.asarray(nl),
                             jnp.asarray(live0)), 'bounce0 NEE shadow')
total += ts

rng = np.random.default_rng(3)
cur_org, cur_dir = org, dirn
cur_hit = hit
alive = live0
for b in (1, 2):
    nrm = np.asarray(cur_hit.n)
    pw = np.asarray(cur_hit.p)
    u1 = jnp.asarray(rng.random(n, np.float32))
    u2 = jnp.asarray(rng.random(n, np.float32))
    nd = sampling.random_cos(jnp.asarray(nrm), u1, u2)
    no = jnp.asarray(pw) + 1e-3 * jnp.asarray(nrm)
    # octant+lkey sort, alive first
    d_np = np.asarray(nd)
    octant = ((d_np[:,0]>0).astype(np.int64)*4 + (d_np[:,1]>0).astype(np.int64)*2
              + (d_np[:,2]>0).astype(np.int64))
    lk = np.clip(np.asarray(cur_hit.lkey if cur_hit.lkey is not None else np.zeros(n)), 0, 8191).astype(np.int64)
    key = np.where(alive, (octant << 13) | lk, 8 << 13)
    perm = np.argsort(key, kind='stable')
    no_s = jnp.asarray(np.asarray(no)[perm])
    nd_s = jnp.asarray(d_np[perm])
    alive_s = alive[perm]
    nlive = int(alive_s.sum())
    log(f'bounce{b}: {nlive} live rays')
    hit2, tb = timed(lambda: closest(no_s, nd_s), f'bounce{b} closest')
    total += tb
    hm = np.asarray(hit2.hit & (hit2.obj_id >= 2)) & alive_s
    _, ts2 = timed(lambda: shadow(no_s, nd_s, jnp.asarray(np.asarray(hit2.p)),
                                  jnp.asarray(np.asarray(hit2.n)),
                                  jnp.asarray(hm)), f'bounce{b} NEE shadow')
    total += ts2
    cur_org, cur_dir, cur_hit, alive = no_s, nd_s, hit2, hm
    log(f'  live after bounce{b}:', hm.sum())
log(f'TOTAL (approximate 1-spp wave): {total:.2f}s')
