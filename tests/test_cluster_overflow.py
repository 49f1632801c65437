"""Cluster-tier overflow (> MAXC clusters per packet) must not drop hits.

Round-1 defect (VERDICT #2 / ADVICE medium): packets entering more than
MAXC=64 clusters silently kept only the 64 nearest-entry ones, so a hit in
a dropped (far) cluster was lost.  The fix is layered:

  * `_residual_lanes` — sound per-lane detection: a lane is exact iff its
    best t <= the worst kept key (every dropped cluster's packet-min entry
    key is >= that, and any hit there has t >= the lane's own entry);
  * a refinement round re-culls residual lanes with their tightened best
    t, collapsing the overflow;
  * scene/mesh.py reroutes lanes still residual after refinement to the
    lockstep BVH (exactness net).

Geometry: MAXC+2 parallel TRIS_C-triangle grid slabs along z (one cluster
each — slab centroids share a z plane, so BVH splits never cut inside a
slab).  All but the last slab span x in [0,S]; the farthest spans x in
[0,2S].  Packet = 1000 rays inside x<S (enter every cluster AABB ->
overflow, keep the MAXC nearest) + 24 rays at x>S whose only hit is in
the DROPPED far slab.  Reference behavior to match:
TriangleMesh.cpp:1133-1235 (no silent hit loss).
"""

import functools

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops.traverse import brute_force_hit

BIG_T = np.float32(1e30)
N_SLABS = pc.MAXC + 2


def _grid_slab(z, nx, ny, cell=1.0):
    """(2*nx*ny, 3, 3) triangles tiling [0, nx] x [0, ny] at height z."""
    tris = np.empty((2 * nx * ny, 3, 3), np.float32)
    k = 0
    for i in range(nx):
        for j in range(ny):
            x0, y0 = i * cell, j * cell
            x1, y1 = x0 + cell, y0 + cell
            a = (x0, y0, z)
            b = (x1, y0, z)
            c = (x1, y1, z)
            d = (x0, y1, z)
            tris[k] = [a, b, c]
            tris[k + 1] = [a, c, d]
            k += 2
    return tris


_G = int(np.sqrt(pc.TRIS_C // 2))     # near slabs: _G x _G cells


def _slab_stack():
    assert 2 * _G * _G == pc.TRIS_C, 'test geometry must fill one cluster'
    slabs = [_grid_slab(100.0 * k, _G, _G) for k in range(N_SLABS - 1)]
    # wide far slab: same tri count, spans x in [0, 2G]
    slabs.append(_grid_slab(100.0 * (N_SLABS - 1), 2 * _G, _G // 2))
    return np.concatenate(slabs, axis=0)


def _rays():
    n = 1024
    org = np.tile(np.array([5.5 + 1 / 3, 5.5 + 1 / 3, -50.0], np.float32),
                  (n, 1))
    org[1000:, 0] = _G + 4.5 + 1 / 3   # only the wide far slab covers x>_G
    dirn = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    return jnp.asarray(org), jnp.asarray(dirn)


def test_overflow_residual_detection_and_refinement():
    tri = _slab_stack()
    cm = pc.build_clustered(tri)
    assert cm.n_clusters == N_SLABS

    org, dirn = _rays()
    tmax = jnp.full((1024,), BIG_T)

    # without refinement: the far-slab lanes are wrong AND flagged residual
    t0, _, _, _, res0 = pc.two_level_hit(cm, org, dirn, tmax, interpret=True,
                                         refine_rounds=0, exhaustive=False,
                                         return_residual=True)
    res0 = np.asarray(res0)
    assert res0[1000:].all(), 'overflowed far-slab lanes must be residual'
    assert (np.asarray(t0)[1000:] >= BIG_T).all(), (
        'precondition: without refinement the dropped-cluster hits are '
        'lost (otherwise this test no longer forces overflow)')
    assert not res0[:1000].any(), 'near-slab lanes are provably exact'

    # one refinement round resolves everything (tightened per-lane tmax
    # collapses the cull to the 2 clusters that can still win)
    t, tid, al, be, res = pc.two_level_hit(cm, org, dirn, tmax,
                                           interpret=True, refine_rounds=1,
                                           exhaustive=False,
                                           return_residual=True)
    assert not np.asarray(res).any()

    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    match = np.asarray(tid) == np.asarray(ref.tri)
    assert match.mean() > 0.999


def test_overflow_mesh_fallback(monkeypatch, tmp_path):
    """With refinement disabled, the scene-level lockstep fallback must
    still produce the exact hit (the soundness net of _mesh_closest_hit)."""
    from pathtracer_tpu.io.obj import MeshData
    from pathtracer_tpu.scene import mesh as mesh_mod
    from pathtracer_tpu.scene import scene as scn

    tri = _slab_stack()
    t_count = tri.shape[0]
    md = MeshData(
        vertices=tri.reshape(-1, 3),
        vtx_idx=np.arange(3 * t_count, dtype=np.int32).reshape(-1, 3),
        normals=np.zeros((1, 3), np.float32),
        n_idx=np.zeros((t_count, 3), np.int32),
        uvs=np.zeros((0, 2), np.float32),
        uv_idx=np.full((t_count, 3), -1, np.int32),
        group=np.zeros(t_count, np.int32),
        materials=[mesh_mod.obj_io.GroupMaterial()],
        group_names={'default': 0},
        show_edges=np.ones((t_count, 3), bool),
        vertex_colors=None,
        tangents=None,
        obj_dir=str(tmp_path),
    )
    # lean=False: this test forces the residual fallback, which needs
    # the soup/bvh the lean tier drops (the dense exhaustive sweep that
    # lean relies on is exactly what refine_rounds=0 disables below)
    mesh = mesh_mod.upload_mesh(md, obj_row=3, use_cluster=True,
                                use_brute=False, lean=False)
    assert mesh.use_cluster and mesh.n_clusters == N_SLABS

    # force refine_rounds=0 so the residual reaches the fallback path
    # (the partial binds the original function before setattr replaces it)
    monkeypatch.setattr(pc, 'two_level_hit',
                        functools.partial(pc.two_level_hit, refine_rounds=0,
                                          exhaustive=False))

    org, dirn = _rays()
    mh = scn._mesh_closest_hit(mesh, org, dirn,
                               jnp.full((1024,), BIG_T))

    ref = brute_force_hit(mesh.soup, org, dirn)
    np.testing.assert_allclose(np.asarray(mh.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    # far-slab lanes specifically must now hit
    assert (np.asarray(mh.t)[1000:] < BIG_T).all()


def test_exhaustive_windowed_sweep_is_exact_without_fallback():
    """The dense-tier default: the windowed loop walks past the MAXC cap
    until every lane is exact — residual identically False and hits match
    brute force even with refine_rounds=0 (no reroute needed)."""
    tri = _slab_stack()
    cm = pc.build_clustered(tri)
    org, dirn = _rays()
    tmax = jnp.full((1024,), BIG_T)

    t, tid, al, be, res = pc.two_level_hit(cm, org, dirn, tmax,
                                           interpret=True, refine_rounds=0,
                                           return_residual=True)
    assert not np.asarray(res).any(), 'exhaustive mode must leave no residual'

    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    match = np.asarray(tid) == np.asarray(ref.tri)
    assert match.mean() > 0.999
    # the far-slab lanes (the ones the cap would have dropped) are right
    assert (np.asarray(t)[1000:] < BIG_T).all()


def test_any_hit_occlusion_exhaustive():
    """two_level_any: exact occlusion incl. overflow windows.  Far-slab
    lanes' only occluder lives in a cluster the first MAXC window drops;
    bounded lanes whose limit stops short of every slab must stay
    unoccluded."""
    tri = _slab_stack()
    cm = pc.build_clustered(tri)
    org, dirn = _rays()

    # limit beyond all slabs: every lane is occluded (all cross a slab)
    occ = pc.two_level_any(cm, org, dirn,
                           jnp.full((1024,), BIG_T), interpret=True)
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    np.testing.assert_array_equal(np.asarray(occ),
                                  np.asarray(ref.t) < BIG_T)
    assert np.asarray(occ).all()

    # limit short of the first slab (slab 0 at z=0, org z=-50 -> t=50):
    # nothing occludes
    occ0 = pc.two_level_any(cm, org, dirn,
                            jnp.full((1024,), 40.0), interpret=True)
    assert not np.asarray(occ0).any()

    # limit between slab 0 and 1: near lanes occluded by slab 0, far-x
    # lanes (whose only occluder is the LAST slab, t=100*(N_SLABS-1)+50)
    # unoccluded
    occ1 = pc.two_level_any(cm, org, dirn,
                            jnp.full((1024,), 100.0), interpret=True)
    occ1 = np.asarray(occ1)
    assert occ1[:1000].all()
    assert not occ1[1000:].any()


def test_any_hit_matches_brute_on_random_mesh():
    rng = np.random.default_rng(3)
    tri = rng.uniform(-10, 10, (4 * pc.TRIS_C, 3, 3)).astype(np.float32)
    tri[:, 1] = tri[:, 0] + rng.uniform(-2, 2, tri[:, 1].shape)
    tri[:, 2] = tri[:, 0] + rng.uniform(-2, 2, tri[:, 2].shape)
    cm = pc.build_clustered(tri)

    n = 2048
    org = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    limit = rng.uniform(2.0, 30.0, (n,)).astype(np.float32)

    occ = pc.two_level_any(cm, jnp.asarray(org), jnp.asarray(d),
                           jnp.asarray(limit), interpret=True)
    ref = brute_force_hit(pc.flat_soup(cm), jnp.asarray(org),
                          jnp.asarray(d))
    expect = np.asarray(ref.t) < limit * (1.0 - 1e-6)
    got = np.asarray(occ)
    # f32 boundary flips allowed only where t ~= limit
    diff = got != expect
    near = np.isclose(np.asarray(ref.t), limit, rtol=1e-5)
    assert (diff <= near).all()
