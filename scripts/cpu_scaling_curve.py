"""Throughput-vs-devices curve on the virtual CPU mesh (VERDICT weak
item: the multichip dryrun proves wiring, not scaling).

Renders a fixed analytic scene at dp = 1, 2, 4, 8 over
xla_force_host_platform_device_count=8 virtual CPU devices and records
wall time + speedup into SCALING_r03.json.  Virtual devices share the
host's physical cores, so the curve demonstrates sharding mechanics and
near-flat *work* scaling (the per-device shard shrinks 1/dp), not real
chip speedup — that needs a pod.  The honest metric here is
work_scaling = t(dp=1) / (t(dp) * dp_efficiency ceiling): on a
c-core host, ideal wall time is flat until dp > c.

Usage:  python scripts/cpu_scaling_curve.py
"""

import json
import os
import sys
import time

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
sys.path.insert(0, '/root/repo')

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pathtracer_tpu as pt  # noqa: E402
from pathtracer_tpu.scene import scene as scn  # noqa: E402
from pathtracer_tpu.parallel import sharding  # noqa: E402
from pathtracer_tpu.core import rng_host  # noqa: E402

W, H, SPP, BOUNCES = 256, 192, 4, 3


def build():
    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    objs.append(pt.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    sc = pt.build_scene(objs, pt.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    return sc, cam


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    sc, cam = build()
    cfg = pt.RenderConfig(width=W, height=H, nrays=SPP,
                          nb_bounces=BOUNCES, samples_per_wave=SPP)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    out = {'width': W, 'height': H, 'spp': SPP, 'bounces': BOUNCES,
           'host_cores': os.cpu_count(), 'results': []}
    t1 = None
    for dp in (1, 2, 4, 8):
        mesh = sharding.make_mesh(n_devices=dp, dp=dp, sp=1)
        render = sharding.make_sharded_render(mesh, cfg, film_ratio=1.0)
        img, cnt = render(sc, cam, cp)
        jax.block_until_ready(img)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            img, cnt = render(sc, cam, cp)
            jax.block_until_ready(img)
            best = min(best, time.perf_counter() - t0)
        if t1 is None:
            t1 = best
        out['results'].append({'dp': dp, 'wall_s': round(best, 4),
                               'speedup_vs_dp1': round(t1 / best, 3)})
        print(out['results'][-1], flush=True)
    with open('/root/repo/SCALING_r03.json', 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote SCALING_r03.json')


if __name__ == '__main__':
    main()
