"""Background-photo compositing + ghost objects."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn

W, H = 16, 12


def _bg(color=(0.2, 0.5, 0.9)):
    bg = np.zeros((6, 8, 3), np.float32)
    bg[:] = np.asarray(color) * 196964.699
    return bg


def test_background_fills_misses():
    objs = scn.default_objects()
    sc = scn.build_scene(objs, scn.default_light_intensity(),
                         background=_bg())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=2, nb_bounces=2)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img) / 196964.699
    # sky pixels (sensor rows near H-1 look up at the dome) must equal
    # the photo exactly
    np.testing.assert_allclose(img[H - 2, W // 2], [0.2, 0.5, 0.9], rtol=1e-4)


def test_ghost_object_invisible_but_shadowing():
    """A ghost sphere must not appear directly but still casts shadows."""
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=8, nb_bounces=2)

    def render(with_ghost):
        objs = scn.default_objects()
        if with_ghost:
            objs.append(scn.sphere((5.0, -10.0, 8.0), 8.0, ghost=True))
        sc = scn.build_scene(objs, scn.default_light_intensity(),
                             background=_bg((0.3, 0.3, 0.3)))
        img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
        return np.asarray(img)

    base = render(False)
    ghosted = render(True)
    assert np.all(np.isfinite(ghosted))
    # sky sensor rows: ghost between camera and dome -> photo still shows
    assert ghosted[H - 2].mean() > 0
    # ground sensor rows (low i) where the ghost shadows must darken vs base
    ground_base = base[1].mean()
    ground_ghost = ghosted[1].mean()
    assert ground_ghost < ground_base


def test_no_background_no_regression():
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert sc.background is None and not sc.ghost_enabled
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=2)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    assert np.all(np.isfinite(np.asarray(img)))
