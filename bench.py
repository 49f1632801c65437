"""Benchmark: wavefront path-tracing throughput on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: hardware ray operations per second on one chip at 1080p.  Each
sample-wave traces W*H paths for nb_bounces bounces; every bounce does one
closest-hit sweep and one NEE shadow sweep over all lanes (lockstep wavefront,
no compaction yet), so rays = W*H * spp * nb_bounces * 2.

Baseline: BASELINE.md targets >=1e9 rays/s aggregate on a v5e-16 at 1080p
64spp => 62.5e6 rays/s per chip.  vs_baseline = value / 62.5e6.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import pathtracer_tpu as pt
    from pathtracer_tpu.core import rng_host
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.scene import scene as scn

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

    r = pt.Renderer(sc, cam, cfg)
    # warmup: compile + first wave
    r.step(WARMUP_SPP)
    jax.block_until_ready(r.image)

    t0 = time.perf_counter()
    done = 0
    while done < BENCH_SPP:
        r.step(WARMUP_SPP)
        done += WARMUP_SPP
    jax.block_until_ready(r.image)
    dt = time.perf_counter() - t0

    rays = W * H * done * BOUNCES * 2
    rays_per_s = rays / dt
    per_chip_target = 1e9 / 16.0
    print(json.dumps({
        "metric": "rays_per_second_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / per_chip_target,
    }))


if __name__ == '__main__':
    main()
