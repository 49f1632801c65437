"""Finite-difference gradcheck of the differentiable render (BASELINE north
star: "pixel gradients must pass finite-difference checks").

Detached-sampling estimator: sampled directions / discrete choices are
stop-gradient'd, gradients flow through NEE weights, BRDF values and the
light power.  The same PCG keys drive both FD evaluations, so the Monte
Carlo noise is perfectly correlated and central differences are accurate.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn

W, H, SPP, BOUNCES = 16, 12, 2, 3


@pytest.fixture(scope='module')
def setup():
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2),
                           ks=(0.15, 0.15, 0.15), ne=(25.0, 25.0, 25.0)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    return sc, cam, cfg, cp


def _loss_fn(sc, cam, cfg, cp):
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    # scaled mean so magnitudes are O(1)
    return jnp.mean(img) / 196964.7


def _fd_check(setup, leaf_name, eps, rtol, indices=((3, 0),)):
    sc, cam, cfg, cp = setup

    def loss_wrt(val):
        return _loss_fn(sc.replace(**{leaf_name: val}), cam, cfg, cp)

    base = getattr(sc, leaf_name)
    grad = jax.grad(loss_wrt)(base)
    assert np.all(np.isfinite(np.asarray(grad))), f"NaN grad for {leaf_name}"

    for idx in indices:
        idx = idx if base.ndim else ()
        delta = np.zeros(base.shape, np.float32) if base.ndim else np.float32(0)
        scale = max(abs(float(np.asarray(base)[idx] if base.ndim else base)),
                    1.0)
        h = eps * scale
        if base.ndim:
            delta[idx] = h
            delta = jnp.asarray(delta)
        else:
            delta = jnp.float32(h)
        lp = float(loss_wrt(base + delta))
        lm = float(loss_wrt(base - delta))
        fd = (lp - lm) / (2 * h)
        ad = float(np.asarray(grad)[idx] if base.ndim else grad)
        assert np.isclose(fd, ad, rtol=rtol, atol=1e-12), (
            f"{leaf_name}{idx}: fd={fd:.6g} autodiff={ad:.6g}")


def test_grad_kd(setup):
    _fd_check(setup, 'kd', eps=1e-3, rtol=2e-2,
              indices=((3, 0), (3, 2), (2, 1)))


def test_grad_ks(setup):
    _fd_check(setup, 'ks', eps=1e-3, rtol=5e-2, indices=((3, 0),))


def test_grad_ne(setup):
    _fd_check(setup, 'ne', eps=1e-2, rtol=5e-2, indices=((3, 1),))


def test_grad_light_intensity(setup):
    sc, cam, cfg, cp = setup

    def loss_wrt(v):
        return _loss_fn(sc.replace(light_intensity=v), cam, cfg, cp)

    base = sc.light_intensity
    g = float(jax.grad(loss_wrt)(base))
    h = 1e-3 * float(base)
    fd = (float(loss_wrt(base + h)) - float(loss_wrt(base - h))) / (2 * h)
    assert np.isfinite(g) and g > 0
    assert np.isclose(fd, g, rtol=1e-2), f"fd={fd} ad={g}"


def test_grad_mesh_group_kd(setup, tmp_path):
    """Gradients reach per-group mesh materials (config-4 style)."""
    import textwrap
    (tmp_path / 'tri.obj').write_text(
        'v -8 -12 0\nv 8 -12 0\nv 0 -4 0\nf 1 2 3\n')
    md = pt.load_mesh(str(tmp_path / 'tri.obj'), preserve_input=True)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    _, cam, cfg, cp = setup

    def loss_wrt(gkd):
        m0 = sc.meshes[0].replace(g_kd=gkd)
        return _loss_fn(sc.replace(meshes=(m0,)), cam, cfg, cp)

    base = sc.meshes[0].g_kd
    grad = jax.grad(loss_wrt)(base)
    assert np.all(np.isfinite(np.asarray(grad)))
    h = 1e-3
    delta = jnp.zeros_like(base).at[0, 0].set(h)
    fd = (float(loss_wrt(base + delta)) - float(loss_wrt(base - delta))) / (2 * h)
    ad = float(np.asarray(grad)[0, 0])
    assert np.isclose(fd, ad, rtol=5e-2), f"fd={fd} ad={ad}"
