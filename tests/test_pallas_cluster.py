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
    # subtree layout: clusters partition the BVH order, counts <= TRIS_C
    st = np.asarray(cm.starts)
    assert st[0] == 0 and (np.diff(st) >= 1).all()
    assert cm.n_clusters >= -(-5000 // pc.TRIS_C)

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
    # the plane-matmul formulation rounds barycentrics differently from
    # the edge-matrix oracle (same planes, different op order) — a few
    # 1e-5 ulps of drift is irrelevant to shading
    np.testing.assert_allclose(np.asarray(al)[match],
                               np.asarray(ref.alpha)[match],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(be)[match],
                               np.asarray(ref.beta)[match],
                               rtol=1e-4, atol=1e-4)


def test_cull_counts_and_padding():
    tri = _random_mesh(9000, seed=3)
    cm = pc.build_clustered(tri)
    assert cm.n_clusters >= -(-9000 // pc.TRIS_C)

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


def test_pallas_cull_matches_dense_cull():
    """The SMEM tree-walk cull (used above DENSE_CULL_MAX clusters) must
    agree with the exact dense XLA rectangle: same per-packet cluster
    set, same overflow counts, same near-first keys."""
    tri = _random_mesh(9000, seed=5)
    cm = pc.build_clustered(tri)
    n = 2 * pc.BLOCK
    org, dirn = _rays(n, seed=6)
    tmax = jnp.full((n,), BIG_T)

    ids_d, cnt_d, keys_d = pc._dense_cull(
        (cm.cb_lox, cm.cb_loy, cm.cb_loz,
         cm.cb_hix, cm.cb_hiy, cm.cb_hiz), org, dirn, tmax)
    ids_p, cnt_p, keys_p = pc._cull_call(
        pc._top_arrays(cm), org, dirn, tmax,
        max_leaf=cm.top_max_leaf, interpret=True)

    np.testing.assert_array_equal(np.asarray(cnt_d), np.asarray(cnt_p))
    for b in range(n // pc.BLOCK):
        c = min(int(cnt_d[b, 0]), pc.MAXC)
        assert set(np.asarray(ids_d)[b, :c]) == set(np.asarray(ids_p)[b, :c])
        np.testing.assert_allclose(np.asarray(keys_d)[b, :c],
                                   np.asarray(keys_p)[b, :c],
                                   rtol=1e-6, atol=1e-6)


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


def test_two_level_big_cluster_size():
    """tris_c > TRIS_C (the >=8M-tri packing, build_clustered docstring):
    the sweep kernel must derive the cluster width from the packed shape
    and return identical hits."""
    tri = _random_mesh(5000, seed=3)
    cm = pc.build_clustered(tri, tris_c=1024)
    assert cm.n_clusters >= -(-5000 // 1024)
    n_sub = 1024 // pc.SUBT
    assert cm.packed.shape[2] == n_sub * (3 * pc.SUBT + pc.SUB_META) + pc.TAIL

    n = 1024
    org, dirn = _rays(n, seed=4)
    tmax = jnp.full((n,), BIG_T)
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    # plane-matmul vs edge-matrix op-order drift: ~1e-6 rel on rare lanes
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    match = (np.asarray(tid) == np.asarray(ref.tri))
    assert match.mean() > 0.999


def test_auto_tris_c_keeps_dense_cull():
    # the auto-doubling rule: cluster count never exceeds DENSE_CULL_MAX
    import math
    for t in (10_000, 9_000_000, 24_000_000):
        tris_c = pc.TRIS_C
        while -(-t // tris_c) > pc.DENSE_CULL_MAX:
            tris_c *= 2
        assert -(-t // tris_c) <= pc.DENSE_CULL_MAX
        assert tris_c % pc.SUBT == 0


def _coherent_rays(n, seed=11):
    """Tile-like rays: one origin, small direction cone (packet frustums
    stay tight, so the hierarchical cull's stage A has no overflow)."""
    rng = np.random.default_rng(seed)
    org = np.broadcast_to(np.array([0.0, 0.0, 30.0], np.float32),
                          (n, 3)).copy()
    d = np.stack([rng.uniform(-0.25, 0.25, n),
                  rng.uniform(-0.25, 0.25, n),
                  -np.ones(n)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_hier_cull_matches_dense_cull():
    """_hier_cull (interval prefilter -> exact top-K rectangle) must
    reproduce _dense_cull's emission exactly whenever no candidate was
    dropped: same live sets, same sorted exact keys; counts may only
    OVER-estimate (conservative)."""
    tri = _random_mesh(9000, seed=13)
    cm = pc.build_clustered(tri)          # 18 clusters
    cb = (cm.cb_lox, cm.cb_loy, cm.cb_loz,
          cm.cb_hix, cm.cb_hiy, cm.cb_hiz)
    n = 2 * pc.BLOCK
    org, dirn = _coherent_rays(n)
    tmax = jnp.full((n,), BIG_T)

    ids_d, cnt_d, keys_d = pc._dense_cull(cb, org, dirn, tmax)
    ids_h, cnt_h, keys_h, cand = pc._hier_cull(cb, org, dirn, tmax)

    cnt_d, cnt_h = np.asarray(cnt_d), np.asarray(cnt_h)
    assert (cnt_h >= cnt_d).all()         # conservative only
    for b in range(n // pc.BLOCK):
        c = min(int(cnt_d[b, 0]), pc.MAXC)
        # exact live set must be preserved (candidates are a superset of
        # the interval-live set which supersets the exact live set)
        assert set(np.asarray(ids_d)[b, :c]) == set(np.asarray(ids_h)[b, :c])
        np.testing.assert_allclose(np.asarray(keys_d)[b, :c],
                                   np.asarray(keys_h)[b, :c],
                                   rtol=1e-6, atol=1e-6)
        # every exact-tested candidate is recorded for swept-marking
        assert set(np.asarray(ids_h)[b, :c]) <= set(
            np.asarray(cand)[b][np.asarray(cand)[b] >= 0].tolist())


def test_hier_two_level_matches_brute_force():
    """End-to-end through the hierarchical cull tier (n_clusters >
    HIER_MIN_CLUSTERS forces _hier_cull inside _two_level_exec),
    including overflow windows: random incoherent packets make stage A
    emit everything, so count > MAXC and the windowed exclusion rounds
    must still converge to the exact closest hit."""
    tri = _random_mesh(80_000, seed=17, spread=14.0)
    cm = pc.build_clustered(tri, tris_c=pc.SUBT)
    assert cm.n_clusters > pc.HIER_MIN_CLUSTERS

    n = pc.BLOCK
    org, dirn = _rays(n, seed=18)         # incoherent: overflow stress
    tmax = jnp.full((n,), BIG_T)
    t, tid, al, be = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    # plane-matmul vs edge-matrix op-order drift + the packed-key winner
    # truncation (near-coincident soup triangles can tie within 2^-16):
    # ~1/512 lanes at ~1e-5 abs on this random 80k soup
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t),
                               rtol=3e-5, atol=2e-5)
    match = (np.asarray(tid) == np.asarray(ref.tri))
    assert match.mean() > 0.999

    # coherent packets (the real wavefront shape): no overflow windows
    org2, dir2 = _coherent_rays(n, seed=19)
    t2, tid2, _, _ = pc.two_level_hit(cm, org2, dir2, tmax, interpret=True)
    ref2 = brute_force_hit(pc.flat_soup(cm), org2, dir2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(ref2.t),
                               rtol=1e-5, atol=1e-6)


def test_hier_two_level_any_matches_closest():
    """Occlusion through the hierarchical cull: any-hit must be True
    exactly where the closest-hit path finds t < tmax."""
    tri = _random_mesh(80_000, seed=23, spread=14.0)
    cm = pc.build_clustered(tri, tris_c=pc.SUBT)
    assert cm.n_clusters > pc.HIER_MIN_CLUSTERS
    n = pc.BLOCK
    org, dirn = _coherent_rays(n, seed=24)
    tmax = jnp.full((n,), 40.0)
    occ = pc.two_level_any(cm, org, dirn, tmax, interpret=True)
    t, _, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(t) < 40.0)


def test_hier_cull_overflow_contract():
    """Round-3 regression (dropped-hit bug): whenever stage A drops
    interval-live clusters beyond the K candidates, _hier_cull must
    report count > MAXC — exact tests killing most candidates must NOT
    mask the drop, or the windowed rounds stop before sweeping the
    dropped clusters."""
    rng = np.random.default_rng(31)
    c = 3 * pc.MAXC
    # clusters scattered in a thick slab; a wide-frustum packet keeps
    # them ALL interval-live, while each ray exactly enters only a few
    lo = rng.uniform(-30, 30, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(15.0, 40.0, (c, 3)).astype(np.float32)
    cb = tuple(jnp.asarray(a) for a in
               (lo[:, 0], lo[:, 1], lo[:, 2], hi[:, 0], hi[:, 1], hi[:, 2]))
    n = pc.BLOCK
    org = jnp.asarray(rng.uniform(-30, 30, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirn = jnp.asarray(d)
    tmax = jnp.full((n,), BIG_T)

    ids_h, cnt_h, keys_h, cand = pc._hier_cull(cb, org, dirn, tmax)
    ids_d, cnt_d, keys_d = pc._dense_cull(cb, org, dirn, tmax)
    # the exact live count exceeds MAXC here (incoherent packet)
    assert int(cnt_d[0, 0]) > pc.MAXC
    # so the hierarchical count must keep reporting overflow even though
    # at most MAXC candidates were exactly tested
    assert int(cnt_h[0, 0]) > pc.MAXC
    # and the last key must lower-bound every non-candidate live cluster
    cand_set = set(np.asarray(cand)[0][np.asarray(cand)[0] >= 0].tolist())
    kd = np.asarray(keys_d)[0]
    idd = np.asarray(ids_d)[0]
    for slot in range(min(int(cnt_d[0, 0]), pc.MAXC)):
        if int(idd[slot]) not in cand_set:
            assert kd[slot] >= np.asarray(keys_h)[0, pc.MAXC - 1] - 1e-5
