"""Pallas packet traversal vs brute force (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.ops import bvh as bvh_mod
from pathtracer_tpu.ops import pallas_bvh
from pathtracer_tpu.ops import traverse


def _mesh_and_rays(t=800, n=pallas_bvh.BLOCK, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-4, 4, (t, 1, 3))
    tri = (base + rng.uniform(-0.5, 0.5, (t, 3, 3))).astype(np.float32)
    fb = bvh_mod.build_bvh(tri)
    packed = pallas_bvh.pack_bvh(fb)
    soup = traverse.make_soup(tri[fb.order])
    org = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return tri, fb, packed, soup, jnp.asarray(org), jnp.asarray(d)


def test_packet_kernel_matches_brute_force():
    tri, fb, packed, soup, org, d = _mesh_and_rays()
    n = org.shape[0]
    tmax = jnp.full((n,), pallas_bvh.BIG_T)
    t, tri_id, al, be = pallas_bvh.packet_hit_packed(
        packed, soup, org, d, tmax, interpret=True)
    brute = traverse.brute_force_hit(soup, org, d)

    np.testing.assert_allclose(np.asarray(t), np.asarray(brute.t), rtol=1e-5)
    hit = np.asarray(brute.t) < 1e29
    assert hit.sum() > 50
    same = np.asarray(tri_id)[hit] == np.asarray(brute.tri)[hit]
    assert same.mean() > 0.99
    np.testing.assert_allclose(np.asarray(al)[hit][same],
                               np.asarray(brute.alpha)[hit][same],
                               rtol=1e-3, atol=1e-4)


def test_packet_kernel_respects_tmax():
    _, _, packed, soup, org, d = _mesh_and_rays(seed=2)
    n = org.shape[0]
    t_full, _, _, _ = pallas_bvh.packet_hit_packed(
        packed, soup, org, d, jnp.full((n,), pallas_bvh.BIG_T),
        interpret=True)
    cap = jnp.full((n,), 3.0)
    t_cap, tri_cap, _, _ = pallas_bvh.packet_hit_packed(
        packed, soup, org, d, cap, interpret=True)
    t_cap = np.asarray(t_cap)
    # hits beyond the cap must be dropped (t stays at the cap)
    beyond = np.asarray(t_full) > 3.0
    assert np.all(t_cap[beyond] == 3.0)
    assert np.all(np.asarray(tri_cap)[beyond] == -1)
