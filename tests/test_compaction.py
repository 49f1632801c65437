"""Stream compaction: identical images, fewer live-lane ray ops.

VERDICT #3: the wavefront queue with stream compaction (SURVEY §2.7;
reference bounded Contrib queue, Raytracer.h:114-115).  Lanes are
independent, so skipping all-dead tail segments must be bit-exact, and the
rays/s accounting must count live lanes only.
"""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn


def _scene():
    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    objs.append(pt.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    return scn.build_scene(objs, scn.default_light_intensity())


def _render(cfg, sc, cam, cp):
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    return np.asarray(img)


def test_compaction_bit_exact():
    W, H = 32, 16                      # N=512, divisible by 16 segments
    sc = _scene()
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    base = rnd.RenderConfig(width=W, height=H, nrays=4, nb_bounces=3)

    img_plain = _render(base, sc, cam, cp)
    img_sort = _render(base._replace(sort_rays=True), sc, cam, cp)
    img_comp = _render(base._replace(compact_rays=True), sc, cam, cp)

    # sorting is a pure permutation (restored), compaction only skips
    # all-dead segments: all three must agree to the bit
    np.testing.assert_array_equal(img_plain, img_sort)
    np.testing.assert_array_equal(img_plain, img_comp)


def test_live_ray_accounting():
    """Renderer.stats must report measured live-lane ray ops: on a scene
    where many primary rays miss to the dome, later bounces have fewer
    live lanes than W*H."""
    W, H = 32, 16
    sc = _scene()
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=2, nb_bounces=3,
                           samples_per_wave=2, compact_rays=True)
    r = rnd.Renderer(sc, cam, cfg).render()
    stats = r.stats(1.0)
    upper = W * H * 2 * 3 * 2         # all-lanes-alive upper bound
    lower = W * H * 2 * 2             # at least the primary bounce
    assert lower <= stats['rays_traced'] < upper, stats
