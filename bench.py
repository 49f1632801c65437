"""Benchmark: wavefront path-tracing throughput on the flagship scene,
plus a mesh-scene end-to-end number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
extra keys:
  hardware_ray_ops_per_s — the flagship's lockstep upper accounting
      (W*H*spp*bounces*2 / s, dead lanes included) kept as a secondary
      key for cross-round comparison with BENCH_r01..r03.
  mesh_scene_rays_per_s — live-lane rays/s of a full 1080p render over a
      2k-triangle displaced sphere (routed through the universal cluster
      tier, scene/mesh.py:256).  Cluster-tier multi-M-tri numbers are
      recorded separately in BENCH_MESH.json because their first compile
      through the remote-compile tunnel takes minutes.
  mesh_scene_tris — triangle count of that scene.
  big_mesh_e2e_rays_per_s / big_mesh_e2e_tris — the contested north-star
      number (VERDICT r04 #2): closed 2.4M-tri displaced sphere through
      the FULL renderer at 1080p, 3 bounces, cluster tier with
      compaction + octant sort, live-lane accounting.
  fwd_ms_per_frame_1080p64 / fwd_bwd_ms_per_frame_1080p64 — forward and
      forward+backward 64-spp frame times through the SAME jitted
      render_unsplatted path (one accounting, mutually consistent; the
      bwd number includes the remat re-forward).

Metric (`value`): MEASURED live-lane rays per second on one chip at
1080p (Renderer.rays_traced: hit + NEE shadow sweeps over lanes that are
actually alive) — the same accounting as the mesh rows and BENCH_MESH.

Baseline: BASELINE.md targets >=1e9 rays/s aggregate on a v5e-16 at 1080p
64spp => 62.5e6 rays/s per chip.  vs_baseline = value / 62.5e6.
"""

import json
import time

import jax
import jax.numpy as jnp


def _bench_renderer(r, warm_spp, bench_spp, reps=3):
    # device_sync, NOT jax.block_until_ready: the latter is a no-op on the
    # axon remote-TPU backend (utils/profiling.device_sync docstring) and
    # silently contaminated the round-1/2 numbers with async tails.
    # Best-of-`reps`: the tunnel adds multi-100ms jitter per dispatch
    # window, and the device clocks ramp over the first seconds.
    from pathtracer_tpu.utils.profiling import device_sync
    r.step(warm_spp)
    device_sync(r.image)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        done = 0
        while done < bench_spp:
            r.step(warm_spp)
            done += warm_spp
        device_sync(r.image)
        best = min(best, time.perf_counter() - t0)
    return done, best


def main():
    import os
    # triage-only escape hatches must be OFF for recorded numbers
    # (VERDICT r3 weak #8): they can silently drop hits.
    for var in ('PT_NO_RESIDUAL_FALLBACK', 'PT_NO_SUBTILE_SKIP'):
        assert os.environ.get(var) != '1', f'{var} set during bench'

    import pathtracer_tpu as pt
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.scene import scene as scn
    from pathtracer_tpu.utils import procgen

    W, H, BOUNCES = 1920, 1080, 3
    WARMUP_SPP, BENCH_SPP = 16, 32

    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2),
                          ks=(0.1, 0.1, 0.1), ne=(30.0, 30.0, 30.0)))
    objs.append(pt.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    objs.append(pt.sphere((17.0, -19.0, -5.0), 8.0, transp=True,
                          refr_index=1.4))
    sc = pt.build_scene(objs, pt.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = pt.RenderConfig(width=W, height=H, nrays=64, nb_bounces=BOUNCES,
                          samples_per_wave=WARMUP_SPP)

    flag_r = pt.Renderer(sc, cam, cfg)
    done, dt = _bench_renderer(flag_r, WARMUP_SPP, BENCH_SPP)
    # live-lane accounting (one standard with the mesh rows); the bench
    # reps trace done out of samples_done total, so scale rays_traced
    fst = flag_r.stats(dt)
    rays_per_s = (fst['rays_traced'] * done / flag_r.samples_done) / dt
    hw_ray_ops_per_s = W * H * done * BOUNCES * 2 / dt

    # mesh scene: 2k-tri displaced sphere through the cluster tier (the
    # universal TPU mesh tier since round 3, scene/mesh.py:256), full
    # renderer (hit + NEE shadow per bounce), live-lane accounting
    md = procgen.sphere_mesh(32, 32, radius=12.0, displace_amp=0.25)
    mobjs = scn.default_objects()
    mobjs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
    msc = scn.build_scene(mobjs, scn.default_light_intensity())
    mcfg = rnd.RenderConfig(width=W, height=H, nrays=8, nb_bounces=BOUNCES,
                            samples_per_wave=2, compact_rays=True)
    mr = rnd.Renderer(msc, cam, mcfg)
    mdone, mdt = _bench_renderer(mr, 2, 4)
    st = mr.stats(mdt)
    # EXACT per-spp scaling (rays_traced accumulates over warmup AND all
    # reps = samples_done spp; the round-4 formula divided by
    # (done + warm) as if reps were 1 and inflated this key 2.33x —
    # honest round-4 value was ~12.7M, not 29.5M)
    mesh_rays_per_s = (st['rays_traced'] * mdone / mr.samples_done) / mdt

    # big-mesh e2e (VERDICT r04 #2): the contested north-star number in
    # the driver artifact, not just hand-run scripts.  Closed 2.4M-tri
    # displaced sphere through the FULL renderer (cluster tier,
    # compaction + octant sort, 3 bounces), live-lane accounting —
    # BENCH_MESH.json 'cluster-e2e' row methodology.  First compile
    # through the remote-compile tunnel takes ~2 min (one-time).
    bmd = procgen.sphere_mesh(1100, 1100, radius=14.0, displace_amp=0.25)
    bobjs = scn.default_objects()
    bobjs.append(scn.mesh_object(bmd, translation=(0.0, -15.0, 0.0)))
    bsc = scn.build_scene(bobjs, scn.default_light_intensity())
    bcfg = rnd.RenderConfig(width=W, height=H, nrays=8, nb_bounces=BOUNCES,
                            samples_per_wave=1, compact_rays=True)
    br = rnd.Renderer(bsc, cam, bcfg)
    bdone, bdt = _bench_renderer(br, 1, 2, reps=2)
    bst = br.stats(bdt)
    big_mesh_rays_per_s = (bst['rays_traced'] * bdone / br.samples_done) / bdt

    # fwd+bwd ms/frame (the BASELINE.md reported metric): gradient of the
    # mean image wrt materials + light through the detached-sampling
    # estimator at 1080p.  remat_samples makes the FULL 64-spp frame fit
    # one backward (each sample wave recomputed during bwd), so this is a
    # MEASURED frame time, not a 16x extrapolation of a 4-spp wave.
    from pathtracer_tpu.core import rng_host
    gcfg = pt.RenderConfig(width=W, height=H, nrays=64, nb_bounces=BOUNCES,
                           remat_samples=True)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))

    @jax.jit
    def fwd_only(kd, li):
        img, _ = rnd.render_unsplatted(
            sc.replace(kd=kd, light_intensity=li), cam, cp, gcfg)
        return jnp.mean(img)

    @jax.jit
    def fwd_bwd(kd, li):
        def loss(kd, li):
            img, _ = rnd.render_unsplatted(
                sc.replace(kd=kd, light_intensity=li), cam, cp, gcfg)
            return jnp.mean(img)
        return jax.grad(loss, argnums=(0, 1))(kd, li)

    from pathtracer_tpu.utils.profiling import device_sync
    device_sync(fwd_only(sc.kd, sc.light_intensity))
    fwd_frame_ms = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        device_sync(fwd_only(sc.kd, sc.light_intensity))
        fwd_frame_ms = min(fwd_frame_ms, (time.perf_counter() - t0) * 1e3)

    g = fwd_bwd(sc.kd, sc.light_intensity)
    device_sync(g)
    fwd_bwd_frame_ms = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        g = fwd_bwd(sc.kd, sc.light_intensity)
        device_sync(g)
        fwd_bwd_frame_ms = min(fwd_bwd_frame_ms,
                               (time.perf_counter() - t0) * 1e3)

    per_chip_target = 1e9 / 16.0
    print(json.dumps({
        "metric": "rays_per_second_per_chip",
        "value": rays_per_s,
        "unit": "live rays/s",
        "vs_baseline": rays_per_s / per_chip_target,
        "hardware_ray_ops_per_s": hw_ray_ops_per_s,
        "mesh_scene_rays_per_s": mesh_rays_per_s,
        "mesh_scene_tris": int(md.num_triangles),
        "big_mesh_e2e_rays_per_s": big_mesh_rays_per_s,
        "big_mesh_e2e_tris": int(bmd.num_triangles),
        "fwd_ms_per_frame_1080p64": fwd_frame_ms,
        "fwd_bwd_ms_per_frame_1080p64": fwd_bwd_frame_ms,
    }))


if __name__ == '__main__':
    main()
