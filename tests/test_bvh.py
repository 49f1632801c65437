"""BVH build + traversal vs brute-force on random meshes (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.ops import bvh as bvh_mod
from pathtracer_tpu.ops import traverse


def _random_mesh(t, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (t, 1, 3))
    tri = base + rng.uniform(-0.4, 0.4, (t, 3, 3))
    return tri.astype(np.float32)


def _random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_build_covers_all_triangles():
    tri = _random_mesh(501)
    fb = bvh_mod.build_bvh(tri)
    assert sorted(fb.order.tolist()) == list(range(501))
    # every leaf range within bounds; leaves partition [0, T)
    leaves = [(a, b) for a, b, lf in zip(fb.node_a, fb.node_b, fb.node_leaf)
              if lf]
    covered = sorted(i for a, b in leaves for i in range(a, b))
    assert covered == list(range(501))
    assert fb.max_leaf <= max(4, fb.max_leaf)  # stat recorded


def test_bvh_hit_matches_brute_force():
    tri = _random_mesh(400, seed=2)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org, d = _random_rays(512)

    brute = traverse.brute_force_hit(soup, org, d)
    trav = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf)

    np.testing.assert_allclose(np.asarray(trav.t), np.asarray(brute.t),
                               rtol=1e-5)
    hit = np.asarray(brute.t) < 1e29
    assert hit.sum() > 20, "test mesh should be hit by many rays"
    # same winning triangle except exact-tie cases
    same_tri = np.asarray(trav.tri)[hit] == np.asarray(brute.tri)[hit]
    assert same_tri.mean() > 0.99
    np.testing.assert_allclose(np.asarray(trav.alpha)[hit][same_tri],
                               np.asarray(brute.alpha)[hit][same_tri],
                               rtol=1e-3, atol=1e-4)


def test_bvh_any_hit_matches_brute():
    tri = _random_mesh(300, seed=3)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org, d = _random_rays(256, seed=4)
    limit = jnp.full((256,), 5.0)

    brute_blocked = traverse.brute_force_any(soup, org, d, limit)
    trav = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf,
                            any_hit_limit=limit)
    trav_blocked = trav.t < limit
    np.testing.assert_array_equal(np.asarray(trav_blocked),
                                  np.asarray(brute_blocked))


def test_degenerate_and_axis_aligned_rays():
    """Axis-aligned rays produce inf inverse directions; slab test must not
    NaN out (the reference relies on IEEE inf semantics, Geometry.h:45-238)."""
    tri = _random_mesh(64, seed=5)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org = jnp.asarray([[0.0, 0.0, -10.0], [0.0, -10.0, 0.0], [-10.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    brute = traverse.brute_force_hit(soup, org, d)
    trav = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf)
    np.testing.assert_allclose(np.asarray(trav.t), np.asarray(brute.t),
                               rtol=1e-5)


def test_bvh_hit_sparse_matches_full():
    """Sparse chunked fallback == full traversal on active lanes, identity
    on inactive lanes (the cluster residual net; chunk < n exercises the
    multi-chunk + pad path)."""
    tri = _random_mesh(400, seed=5)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org, d = _random_rays(301, seed=7)
    n = 301

    rng = np.random.default_rng(9)
    active = jnp.asarray(rng.random(n) < 0.3)

    # running best: garbage on active lanes, sentinel elsewhere
    t0 = jnp.full((n,), traverse.BIG_T)
    tri0 = jnp.full((n,), -1, jnp.int32)
    al0 = jnp.ones((n,))
    be0 = jnp.zeros((n,))

    t, trid, al, be = traverse.bvh_hit_sparse(
        bvh, soup, org, d, active, max_leaf=fb.max_leaf,
        t=t0, tri=tri0, alpha=al0, beta=be0, chunk=64)

    full = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf)
    act = np.asarray(active)
    np.testing.assert_allclose(np.asarray(t)[act], np.asarray(full.t)[act],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(trid)[act],
                                  np.asarray(full.tri)[act])
    # inactive lanes untouched
    np.testing.assert_array_equal(np.asarray(t)[~act],
                                  np.asarray(t0)[~act])
    np.testing.assert_array_equal(np.asarray(trid)[~act],
                                  np.asarray(tri0)[~act])


def test_bvh_hit_sparse_no_active_is_identity():
    tri = _random_mesh(64, seed=6)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org, d = _random_rays(50, seed=8)
    t0 = jnp.linspace(1.0, 2.0, 50)
    tri0 = jnp.arange(50, dtype=jnp.int32)
    t, trid, _, _ = traverse.bvh_hit_sparse(
        bvh, soup, org, d, jnp.zeros((50,), bool), max_leaf=fb.max_leaf,
        t=t0, tri=tri0, alpha=jnp.ones((50,)), beta=jnp.zeros((50,)),
        chunk=16)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(trid), np.asarray(tri0))


def test_bvh_hit_sparse_respects_prior_best():
    """A closer prior best on an active lane must survive (strict <)."""
    tri = _random_mesh(300, seed=11)
    fb = bvh_mod.build_bvh(tri)
    soup = traverse.make_soup(tri[fb.order])
    bvh = traverse.upload_bvh(fb)
    org, d = _random_rays(128, seed=12)
    full = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf)
    # prior best strictly closer than any real hit
    t0 = jnp.where(full.t < 1e29, full.t * 0.5, jnp.full_like(full.t, 1e-3))
    tri0 = jnp.full((128,), 777, jnp.int32)
    t, trid, _, _ = traverse.bvh_hit_sparse(
        bvh, soup, org, d, jnp.ones((128,), bool), max_leaf=fb.max_leaf,
        t=t0, tri=tri0, alpha=jnp.ones((128,)), beta=jnp.zeros((128,)),
        chunk=48)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t0))
    np.testing.assert_array_equal(np.asarray(trid), np.asarray(tri0))
