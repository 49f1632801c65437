"""Device-vs-CPU forward-image parity (the BASELINE correctness clause,
run on REAL hardware): render the same mesh scene with identical PCG
sample sequences on the TPU (real Pallas kernels) and on forced-CPU
(interpret mode), and compare per-pixel.

Visibility-boundary samples can flip under f32 op-order differences
(HIGHEST-precision MXU matmul vs CPU scalar FMA), so the check allows a
small fraction of pixels to differ while requiring the rest to match
tightly (same policy as tests/test_integrator_vs_cpu.py).

Writes DEVICE_PARITY.json.  Run: python scripts/tpu_device_parity.py
"""
import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import json
import subprocess

import numpy as np

OUT = '/root/repo/DEVICE_PARITY.json'
W, H, SPP, BOUNCES = 192, 108, 4, 3

CHILD = r'''
import sys; sys.path.insert(0, '/root/repo')
import numpy as np
backend = sys.argv[1]
if backend == 'cpu':
    import jax; jax.config.update('jax_platforms', 'cpu')
import jax, jax.numpy as jnp
import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen
from pathtracer_tpu.core import rng_host

W, H, SPP, BOUNCES = %d, %d, %d, %d
md = procgen.sphere_mesh(64, 64, radius=12.0, displace_amp=0.25)
objs = scn.default_objects()
objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
objs.append(pt.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
sc = pt.build_scene(objs, pt.default_light_intensity())
cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
cfg = pt.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
np.save(sys.argv[2], np.asarray(img))
print('done', backend, flush=True)
''' % (W, H, SPP, BOUNCES)


def render(backend, path):
    r = subprocess.run([sys.executable, '-c', CHILD, backend, path],
                       capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise SystemExit(f'{backend} render failed')


render('tpu', '/tmp/parity_tpu.npy')
render('cpu', '/tmp/parity_cpu.npy')
a = np.load('/tmp/parity_tpu.npy')
b = np.load('/tmp/parity_cpu.npy')
# tone-map-ish normalization so the tolerance is perceptual-ish
s = np.maximum(b.max(), 1e-9)
rel = np.abs(a - b) / (np.abs(b) + 0.01 * s)
frac_close = float((rel.max(axis=-1) < 0.02).mean())
result = {
    'scene': f'{W}x{H} {SPP}spp {BOUNCES}b, 8k-tri displaced sphere '
             '(cluster tier) + mirror + analytic slate',
    'pixels_within_2pct': frac_close,
    'median_rel_err': float(np.median(rel)),
    'max_pixel_rel_err': float(rel.max()),
    'pass': frac_close > 0.995,
}
json.dump(result, open(OUT, 'w'), indent=1)
print(json.dumps(result))
