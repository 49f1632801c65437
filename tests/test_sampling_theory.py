"""Sampling correctness: pdf-vs-histogram chi^2, white furnace (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host, sampling
from pathtracer_tpu.models import brdf
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn


def _chi2_cos_weighted(dirs, n, bins=10):
    """Chi-square of cos-hemisphere samples against the analytic pdf."""
    cz = np.asarray(dirs) @ np.asarray(n)
    assert (cz > -1e-6).all(), "samples below the hemisphere"
    # P(cos theta in [a,b]) = b^2 - a^2 under pdf = cos/pi
    edges = np.linspace(0, 1, bins + 1)
    expected = (edges[1:] ** 2 - edges[:-1] ** 2) * len(cz)
    counts, _ = np.histogram(cz, bins=edges)
    chi2 = np.sum((counts - expected) ** 2 / np.maximum(expected, 1))
    return chi2


def test_random_cos_chi2():
    rng = np.random.default_rng(0)
    n = np.array([0.3, 0.8, 0.52])
    n /= np.linalg.norm(n)
    u1 = jnp.asarray(rng.uniform(0, 1, 20000).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, 20000).astype(np.float32))
    d = sampling.random_cos(jnp.broadcast_to(jnp.asarray(n, jnp.float32),
                                             (20000, 3)), u1, u2)
    chi2 = _chi2_cos_weighted(d, n)
    # 9 dof, p=0.001 critical ~ 27.9
    assert chi2 < 27.9, f"chi2={chi2}"


def test_phong_sample_pdf_integrates_to_one():
    """Monte Carlo: E[1/pdf * indicator(valid)] over the sampled lobe ~ its
    own support measure; equivalently E over samples of f/pdf for f=pdf is 1."""
    rng = np.random.default_rng(1)
    n = jnp.asarray([0.0, 1.0, 0.0])
    wo = jnp.asarray([0.3, 0.8, 0.1])
    wo = wo / jnp.linalg.norm(wo)
    m = 40000
    kd = jnp.full((m, 3), 0.5)
    ks = jnp.full((m, 3), 0.3)
    ne = jnp.full((m, 3), 25.0)
    u = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    r1 = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    r2 = jnp.asarray(rng.uniform(0, 1, m).astype(np.float32))
    nb = jnp.broadcast_to(n, (m, 3))
    wob = jnp.broadcast_to(wo, (m, 3))
    d, pdf, _ = brdf.phong_sample(kd, ks, ne, wob, nb, u, r1, r2)
    # estimator of integral over hemisphere of the mixture pdf:
    # sum (pdf_analytic(d)/pdf_sample(d)) / m == 1 when they agree
    est = jnp.where(pdf > 1e-6, 1.0, 0.0)  # valid-sample fraction proxy
    # stronger: re-evaluate the analytic mixture pdf at the sampled dirs
    from pathtracer_tpu.core import vec
    r_mirror = vec.reflect(-wob, nb)
    avg_ne = jnp.mean(ne, axis=-1)
    p = 1.0 - jnp.mean(ks, axis=-1)
    proba_phong = ((avg_ne + 1) / (2 * np.pi)
                   * jnp.maximum(vec.dot(r_mirror, d), 0.0) ** avg_ne)
    pdf_re = p * jnp.maximum(vec.dot(nb, d), 0.0) / np.pi \
        + (1 - p) * proba_phong
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_re),
                               rtol=1e-4, atol=1e-6)
    assert float(est.mean()) > 0.99


def test_white_furnace_bound():
    """A kd=1 Lambertian sphere under a uniform dome: with enough bounces the
    sphere's radiance approaches the dome radiance from below (energy
    conservation — never exceeds it)."""
    env_val = 0.5
    env = np.full((8, 16, 3), env_val, np.float32)
    dome_rad = env_val * 100000.0 / 255.0
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(1.0, 1.0, 1.0)))
    # no analytic light: kill the light sphere's power
    sc = scn.build_scene(objs, light_intensity=0.0, envmap=env)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=32, nb_bounces=6)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img)
    sphere_region = img[3:6, 6:10]        # on-sphere pixels
    ratio = sphere_region.mean() / dome_rad
    assert 0.5 < ratio <= 1.02, f"furnace ratio {ratio}"
    # sky pixels see the dome exactly
    np.testing.assert_allclose(img[10, 8] / dome_rad, 1.0, rtol=1e-4)
