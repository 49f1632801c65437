"""On-device differentiable MESH render (VERDICT r03 weak #5): time
jax.grad through a cluster-tier mesh scene on the real chip.

The Pallas traversal kernels carry no VJP — the detached-sampling
estimator (SURVEY §7) differentiates the shading/estimator math around
them (hit ids/positions are stop-gradiented, reference counterpart of
differentiating w.r.t. materials at fixed paths), so the backward pass
re-runs the forward kernels (remat) plus the shading VJP only.

Records mesh fwd vs fwd+bwd ms/frame at 1080p x 16 spp; paste into
BENCH_MESH.json.  Run: timeout 3000 python scripts/tpu_mesh_grad.py
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time

import jax
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen
from pathtracer_tpu.utils.profiling import device_sync

W, H, SPP, BOUNCES = 1920, 1080, 16, 3


def log(*a):
    print(*a, flush=True)


def main():
    log('devices:', jax.devices())
    md = procgen.sphere_mesh(32, 32, radius=12.0, displace_amp=0.25)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    m = sc.meshes[0]
    log('mesh tris', m.num_triangles, 'cluster tier:', m.use_cluster,
        'clusters', m.n_clusters)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = pt.RenderConfig(width=W, height=H, nrays=SPP,
                          nb_bounces=BOUNCES, remat_samples=True)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))

    def set_leaves(g_kd, li):
        return sc.replace(
            meshes=(sc.meshes[0].replace(g_kd=g_kd),) + sc.meshes[1:],
            light_intensity=li)

    @jax.jit
    def fwd(g_kd, li):
        img, _ = rnd.render_unsplatted(set_leaves(g_kd, li), cam, cp, cfg)
        return jnp.mean(img)

    @jax.jit
    def fwd_bwd(g_kd, li):
        def loss(g_kd, li):
            img, _ = rnd.render_unsplatted(set_leaves(g_kd, li), cam, cp,
                                           cfg)
            return jnp.mean(img)
        return jax.grad(loss, argnums=(0, 1))(g_kd, li)

    kd0, li0 = m.g_kd, sc.light_intensity
    t0 = time.time()
    device_sync(fwd(kd0, li0))
    log(f'fwd compile+run {time.time() - t0:.1f}s')
    best_f = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        device_sync(fwd(kd0, li0))
        best_f = min(best_f, time.perf_counter() - t0)

    t0 = time.time()
    g = fwd_bwd(kd0, li0)
    device_sync(g)
    log(f'fwd+bwd compile+run {time.time() - t0:.1f}s')
    gk = jax.tree.map(lambda x: float(jnp.abs(x).max()), g)
    log('grad magnitudes (finite, nonzero):', gk)
    assert all(v == v and v > 0 for v in jax.tree.leaves(gk)), gk
    best_fb = 1e30
    for _ in range(2):
        t0 = time.perf_counter()
        g = fwd_bwd(kd0, li0)
        device_sync(g)
        best_fb = min(best_fb, time.perf_counter() - t0)

    log(f'[mesh-grad] {m.num_triangles} tris, {W}x{H}x{SPP}spp: '
        f'fwd {best_f * 1e3:.0f} ms/frame, '
        f'fwd+bwd {best_fb * 1e3:.0f} ms/frame '
        f'(ratio {best_fb / best_f:.2f})')


if __name__ == '__main__':
    main()
