"""Routed per-lane cluster sweeps vs the dense oracle and two_level_hit."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops import routed_cluster as rc
from pathtracer_tpu.ops.traverse import brute_force_hit

BIG_T = float(pc.BIG_T)


def _terrain(g, seed=0):
    xs = np.linspace(-20, 20, g + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing='ij')
    Y = 3.0 * np.sin(X * 0.6) * np.cos(Z * 0.5) \
        + 1.2 * np.sin(X * 1.7 + seed)
    V = np.stack([X, Y, Z], -1)
    q00, q10, q01, q11 = V[:-1, :-1], V[1:, :-1], V[:-1, 1:], V[1:, 1:]
    return np.concatenate([
        np.stack([q00, q10, q11], 2).reshape(-1, 3, 3),
        np.stack([q00, q11, q01], 2).reshape(-1, 3, 3)], 0)


def _camera_rays(n, origin=(0.0, 25.0, 30.0), seed=1, pitch=-1.8):
    rng = np.random.default_rng(seed)
    org = np.asarray(origin, np.float32)[None, :] \
        + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] += pitch
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.fixture(scope='module')
def cm():
    return pc.build_clustered(_terrain(90), tris_c=512)   # ~16k tris


def _check(cm, org, dirn, tmax, tmin=None, **kw):
    t, tri, al, be = rc.routed_hit(cm, org, dirn, tmax, tmin=tmin,
                                   interpret=True, **kw)
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn,
                          t_max=tmax, t_min=tmin)
    t = np.asarray(t)
    t_ref = np.asarray(ref.t)
    hit = t_ref < np.asarray(tmax)
    assert hit.any(), 'vacuous test'
    np.testing.assert_allclose(t, t_ref, atol=2e-4)
    assert (np.asarray(tri)[hit] == np.asarray(ref.tri)[hit]).mean() > 0.999
    np.testing.assert_allclose(np.asarray(al)[hit],
                               np.asarray(ref.alpha)[hit], atol=2e-3)


def test_routed_coherent(cm):
    org, dirn = _camera_rays(pc.BLOCK)
    _check(cm, org, dirn, jnp.full((pc.BLOCK,), BIG_T))


def test_routed_incoherent(cm):
    rng = np.random.default_rng(5)
    n = 2 * pc.BLOCK
    org = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    org[:, 1] = rng.uniform(6, 30, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] -= 0.6
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _check(cm, jnp.asarray(org), jnp.asarray(d), jnp.full((n,), BIG_T))


def test_routed_multi_round(cm):
    org, dirn = _camera_rays(pc.BLOCK, seed=3)
    _check(cm, org, dirn, jnp.full((pc.BLOCK,), BIG_T), rounds=2)


def test_routed_bounded_tmax(cm):
    # shadow-style bound: only hits below the bound count
    org, dirn = _camera_rays(pc.BLOCK, seed=7)
    tmax = jnp.full((pc.BLOCK,), 26.0)
    _check(cm, org, dirn, tmax)


def test_routed_tmin_floor(cm):
    # alpha-cutout style strict floor.  Floor at 1.02x the first hit:
    # a floor at exactly t0 is a knife edge (the adjacent triangle of
    # the same surface point re-hits at t0 + O(1e-5) and flips on f32
    # noise — the boundary-flip class CLAUDE.md documents)
    org, dirn = _camera_rays(pc.BLOCK, seed=9, pitch=-0.5)
    tmax = jnp.full((pc.BLOCK,), BIG_T)
    t0, _, _, _ = rc.routed_hit(cm, org, dirn, tmax, interpret=True)
    tmin = jnp.where(jnp.asarray(t0) < 1e29, t0 * 1.02, -1.0)
    _check(cm, org, dirn, tmax, tmin=tmin)


def test_routed_matches_two_level(cm):
    org, dirn = _camera_rays(pc.BLOCK, seed=11)
    tmax = jnp.full((pc.BLOCK,), BIG_T)
    t_r, tri_r, _, _ = rc.routed_hit(cm, org, dirn, tmax, interpret=True)
    t_p, tri_p, _, _ = pc.two_level_hit(cm, org, dirn, tmax,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(t_r), np.asarray(t_p),
                               atol=2e-4)
