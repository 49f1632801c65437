"""Subsurface on BVH-tier meshes (VERDICT #4) + the unbiasedness gate.

The disk-probe BSSRDF needs a uniformly-random same-object intersection
(reference: TriangleMesh.cpp:1321-1428 reservoir traversal).  The dense
count-then-pick sweep covers every mesh up to MESH_RESERVOIR_MAX_TRIS
(brute, packet and mid-size BVH tiers); bigger (cluster-tier) meshes use
the crossing march (_mesh_reservoir_march): repeated tiered closest-hit
traversals with a rising strict t floor, then count-then-pick.  Rows
without any reservoir path (pointsets/yarns) still opt out of the SS
entry RR via SceneArrays.ss_obj_ok so the estimator stays unbiased
(ADVICE medium: a probe that categorically fails would duplicate the
surface estimator ~2x).
"""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen

W, H, SPP, BOUNCES = 16, 12, 4, 3


def _mesh_scene(ksub=(0.6, 0.4, 0.3), n=80):
    md = procgen.sphere_mesh(n, n, radius=10.0)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, translation=(0.0, -17.0, 0.0),
                                ksub=ksub))
    return scn.build_scene(objs, scn.default_light_intensity())


def test_reservoir_on_bvh_mesh_matches_oracle():
    """count-then-pick on a 12.6k-tri mesh (above the brute/packet tiers)
    must equal the brute-forced 'floor(u*count)-th hit along the ray'."""
    sc = _mesh_scene()
    mesh = sc.meshes[0]
    assert mesh.num_triangles > 8192 and not mesh.use_brute
    assert scn._mesh_reservoir_supported(mesh)
    assert bool(sc.ss_obj_ok[3])

    n = 64
    rng = np.random.default_rng(0)
    org = np.array([0.0, -17.0, 30.0], np.float32) + \
        rng.normal(0, 2.0, (n, 3)).astype(np.float32)
    d = np.array([0.0, 0.0, -1.0], np.float32) + \
        rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(n, 60.0, np.float32)
    u = rng.uniform(0.05, 0.95, n).astype(np.float32)

    probe = scn.reservoir_same_object(
        sc, jnp.asarray(org), jnp.asarray(d), jnp.asarray(tmax),
        jnp.full((n,), 3, jnp.int32), jnp.asarray(u))
    found = np.asarray(probe.found)
    assert found.mean() > 0.9, 'rays through the sphere must find exits'

    # brute oracle over the same soup order (mesh-local = world frame after
    # subtracting the row translation)
    from pathtracer_tpu.ops import traverse
    org_l = org - np.array([0.0, -17.0, 0.0], np.float32)
    soup = mesh.soup
    ts = []
    for start in range(0, mesh.num_triangles, 4096):
        sl = slice(start, min(start + 4096, mesh.num_triangles))
        tt, _, _, _ = traverse._tri_test_block(soup, sl, jnp.asarray(org_l),
                                               jnp.asarray(d))
        ts.append(np.asarray(tt))
    t_all = np.concatenate(ts, axis=1)
    valid = (t_all >= 0.0) & (t_all < tmax[:, None])
    t_probe = np.asarray(probe.t)
    for i in range(n):
        cnt = int(valid[i].sum())
        assert found[i] == (cnt > 0)
        if cnt:
            pick = min(int(u[i] * cnt), cnt - 1)
            t_ord = t_all[i][valid[i]]           # candidates in soup order
            np.testing.assert_allclose(t_probe[i], t_ord[pick], rtol=1e-5)


def test_ss_mesh_render_contributes():
    sc_ss = _mesh_scene()
    sc_no = _mesh_scene(ksub=(0.0, 0.0, 0.0))
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    img_ss, _ = rnd.render_unsplatted(sc_ss, cam, cp, cfg)
    img_no, _ = rnd.render_unsplatted(sc_no, cam, cp, cfg)
    img_ss, img_no = np.asarray(img_ss), np.asarray(img_no)
    assert np.isfinite(img_ss).all()
    assert np.abs(img_ss - img_no).max() > 1e-3, 'SS must change the render'


def test_ss_gate_unbiased_pointset():
    """A ksub object whose reservoir path does not exist (pointset rows)
    must render EXACTLY like the ksub=0 one (SS RR disabled, gated draws
    leave streams untouched)."""
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 3, (300, 3)).astype(np.float32)
    pts[:, 1] -= 18.0

    def build(ksub):
        objs = scn.default_objects()
        objs.append(scn.pointset_object({'points': pts}, ksub=ksub))
        return scn.build_scene(objs, scn.default_light_intensity())

    sc_gated = build((0.6, 0.4, 0.3))
    assert not bool(sc_gated.ss_obj_ok[3])
    sc_no = build((0.0, 0.0, 0.0))

    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    img_g, _ = rnd.render_unsplatted(sc_gated, cam, cp, cfg)
    img_n, _ = rnd.render_unsplatted(sc_no, cam, cp, cfg)
    np.testing.assert_array_equal(np.asarray(img_g), np.asarray(img_n))


def test_reservoir_march_matches_sorted_oracle(monkeypatch):
    """The crossing march (big-mesh tier) must pick the floor(u*count)-th
    hit in ASCENDING-T order — its own exact oracle from a brute sweep."""
    monkeypatch.setattr(scn, 'MESH_RESERVOIR_MAX_TRIS', 1000)
    sc = _mesh_scene()                    # 12.6k tris -> march path
    mesh = sc.meshes[0]
    assert mesh.num_triangles > scn.MESH_RESERVOIR_MAX_TRIS

    n = 48
    rng = np.random.default_rng(1)
    org = np.array([0.0, -17.0, 30.0], np.float32) + \
        rng.normal(0, 2.0, (n, 3)).astype(np.float32)
    d = np.array([0.0, 0.0, -1.0], np.float32) + \
        rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmax = np.full(n, 60.0, np.float32)
    u = rng.uniform(0.05, 0.95, n).astype(np.float32)

    probe = scn.reservoir_same_object(
        sc, jnp.asarray(org), jnp.asarray(d), jnp.asarray(tmax),
        jnp.full((n,), 3, jnp.int32), jnp.asarray(u))
    found = np.asarray(probe.found)
    t_probe = np.asarray(probe.t)
    assert found.mean() > 0.9

    from pathtracer_tpu.ops import traverse
    org_l = org - np.array([0.0, -17.0, 0.0], np.float32)
    ts = []
    for start in range(0, mesh.num_triangles, 4096):
        sl = slice(start, min(start + 4096, mesh.num_triangles))
        tt, _, _, _ = traverse._tri_test_block(
            mesh.soup, sl, jnp.asarray(org_l), jnp.asarray(d))
        ts.append(np.asarray(tt))
    t_all = np.concatenate(ts, axis=1)
    valid = (t_all >= 0.0) & (t_all < tmax[:, None])
    for i in range(n):
        cnt = int(valid[i].sum())
        assert found[i] == (cnt > 0), f"lane {i}: count {cnt}"
        if cnt:
            pick = min(int(u[i] * cnt), cnt - 1)
            t_sorted = np.sort(t_all[i][valid[i]])
            np.testing.assert_allclose(t_probe[i], t_sorted[pick],
                                       rtol=1e-5)


def test_ss_march_render_contributes(monkeypatch):
    monkeypatch.setattr(scn, 'MESH_RESERVOIR_MAX_TRIS', 1000)
    sc_ss = _mesh_scene()
    assert bool(sc_ss.ss_obj_ok[3])
    sc_no = _mesh_scene(ksub=(0.0, 0.0, 0.0))
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    img_ss, _ = rnd.render_unsplatted(sc_ss, cam, cp, cfg)
    img_no, _ = rnd.render_unsplatted(sc_no, cam, cp, cfg)
    assert np.isfinite(np.asarray(img_ss)).all()
    assert np.abs(np.asarray(img_ss) - np.asarray(img_no)).max() > 1e-3


def _wall_stack_mesh(n_walls=24, size=6.0):
    """n_walls parallel quads stacked along z — a ray through them makes
    n_walls crossings (the march's pathological case)."""
    from pathtracer_tpu.io.obj import MeshData, GroupMaterial
    verts, tris = [], []
    for k in range(n_walls):
        z = -float(k)
        b = len(verts)
        verts += [(-size, -size, z), (size, -size, z),
                  (size, size, z), (-size, size, z)]
        tris += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    t = len(tris)
    return MeshData(
        vertices=verts, normals=np.zeros((1, 3), np.float32),
        uvs=np.zeros((1, 2), np.float32), vtx_idx=tris,
        uv_idx=np.zeros_like(tris), n_idx=np.zeros_like(tris),
        group=np.zeros(t, np.int32), show_edges=np.ones((t, 3), bool),
        vertex_colors=None, materials=[GroupMaterial()],
        group_names={'default': 0}, obj_dir='')


def test_reservoir_march_overflow_reported():
    """Lanes crossing more than RESERVOIR_MAX_CROSSINGS surfaces must
    report overflow=True (surfaced as the ss_reservoir_overflow stat) —
    the probe result is a biased miss there, and silence would hide it."""
    from pathtracer_tpu.scene import mesh as mesh_mod
    md = _wall_stack_mesh(scn.RESERVOIR_MAX_CROSSINGS + 8)
    mesh = mesh_mod.upload_mesh(md, obj_row=2, interp_normals=False)
    n = 8
    org = np.tile(np.array([[0.0, 0.0, 5.0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    # half the lanes stop after 2 walls (no overflow), half go through all
    tmax = np.where(np.arange(n) < 4, 1e4, 6.5).astype(np.float32)
    out = scn._mesh_reservoir_march(
        mesh, jnp.asarray(org), jnp.asarray(d), jnp.asarray(tmax),
        jnp.full((n,), 0.5))
    found, ov = np.asarray(out[0]), np.asarray(out[6])
    assert ov[:4].all()          # exhausted the slot budget
    assert not found[:4].any()   # overflow lanes report a probe miss
    assert not ov[4:].any()
    assert found[4:].all()


def test_ss_overflow_stat_zero_on_real_scene(monkeypatch):
    """On a real closed-sphere SS scene the march overflow must be RARE —
    the renderer stat records exactly how rare (here: zero)."""
    monkeypatch.setattr(scn, 'MESH_RESERVOIR_MAX_TRIS', 1000)
    sc_ss = _mesh_scene()       # 12.6k tris -> crossing-march tier
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=2, nb_bounces=BOUNCES,
                           samples_per_wave=2)
    r = rnd.Renderer(sc_ss, cam, cfg)
    r.step(2)
    st = r.stats(1.0)
    assert st['ss_reservoir_overflow'] == 0
