"""Two-level cluster traversal (interpret mode) vs dense brute force.

Validates the experimental big-mesh kernel pair of ops/pallas_cluster.py:
phase-1 culling must never drop a cluster a hitting ray needs, and the
phase-2 scalar-prefetch sweep must reproduce the exact closest hit of the
reference semantics (TriangleMesh.cpp:1133-1235) as computed by
brute_force_hit over the same BVH-ordered soup.
"""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops.traverse import brute_force_hit

BIG_T = np.float32(1e30)


def _random_mesh(t, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    offsets = rng.normal(0, 0.35, (t, 3, 3)).astype(np.float32)
    return centers[:, None, :] + offsets


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_two_level_matches_brute_force():
    tri = _random_mesh(5000)
    cm = pc.build_clustered(tri)
    assert cm.n_clusters == 3

    n = 1024
    org, dirn = _rays(n)
    tmax = jnp.full((n,), BIG_T)

    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)

    # ground truth over the SAME padded BVH-ordered soup (tri ids line up:
    # clusters are contiguous TRIS_C chunks of the global order)
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    # mask out hits on the zero-padding tris (rejected by NaN in both, but
    # be explicit)
    t_ref = np.asarray(ref.t)
    t_np = np.asarray(t)

    np.testing.assert_allclose(t_np, t_ref, rtol=1e-6, atol=1e-6)
    # tri ids: ties between equal-t triangles may resolve differently
    # (emission order vs index order) — require near-total agreement
    match = (np.asarray(tid) == np.asarray(ref.tri))
    assert match.mean() > 0.999, match.mean()
    np.testing.assert_allclose(np.asarray(al)[match],
                               np.asarray(ref.alpha)[match],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(be)[match],
                               np.asarray(ref.beta)[match],
                               rtol=1e-5, atol=1e-5)


def test_cull_counts_and_padding():
    tri = _random_mesh(9000, seed=3)
    cm = pc.build_clustered(tri)
    assert cm.n_clusters == 5

    n = 1500                      # not a multiple of BLOCK -> padding path
    org, dirn = _rays(n, seed=4)
    tmax = jnp.full((n,), BIG_T)
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)
    assert t.shape == (n,)

    pad = (-n) % pc.BLOCK
    org_p = jnp.concatenate([org, jnp.full((pad, 3), 1e6)])
    dir_p = jnp.concatenate(
        [dirn, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (pad, 3))])
    tmax_p = jnp.concatenate([tmax, jnp.full((pad,), -1.0)])
    ids, count, keys = pc.cluster_cull(cm, org_p, dir_p, tmax_p,
                                       interpret=True)
    count = np.asarray(count)[:, 0]
    ids = np.asarray(ids)
    assert (count <= cm.n_clusters).all()      # no duplicates possible
    for b in range(ids.shape[0]):
        c = min(count[b], pc.MAXC)
        assert (ids[b, :c] >= 0).all()
        assert (ids[b, c:] == -1).all()
        assert len(set(ids[b, :c].tolist())) == c   # each cluster once


def test_tmin_excludes_near_hits():
    tri = _random_mesh(3000, seed=7)
    cm = pc.build_clustered(tri)
    n = 256
    org, dirn = _rays(n, seed=8)
    tmax = jnp.full((n,), BIG_T)
    t0, _, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)
    hit = np.asarray(t0) < 1e29
    # excluding everything at or below the first hit must yield strictly
    # farther intersections
    t1, _, _, _ = pc.two_level_hit(cm, org, dirn, tmax, tmin=t0,
                                   interpret=True)
    t1 = np.asarray(t1)
    assert (t1[hit] > np.asarray(t0)[hit]).all()
