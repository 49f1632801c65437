"""Merged multi-mesh BVH (the Embree instance-BVH analogue) vs the
per-mesh loop: identical hits and materials."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.scene import mesh as mesh_mod
from pathtracer_tpu.utils import procgen


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-c * 0 - s, 0, c]], np.float32)


def _objs():
    objs = scn.default_objects()
    m1 = procgen.sphere_mesh(24, 24, radius=5.0)
    m2 = procgen.sphere_mesh(16, 16, radius=4.0, displace_amp=0.3)
    m3 = procgen.terrain_mesh(12, extent=10.0, amp=1.0)
    kd_tex = np.zeros((4, 4, 3), np.float32)
    kd_tex[:, :2, 0] = 1.0
    kd_tex[:, 2:, 1] = 1.0
    objs.append(scn.mesh_object(m1, translation=(-8.0, -14.0, 0.0),
                                kd=(0.8, 0.2, 0.2)))
    objs.append(scn.mesh_object(m2, translation=(8.0, -14.0, 0.0),
                                rotation=_rot_y(0.7), scale=1.5,
                                transp=True, refr_index=1.4,
                                textures={'kd': kd_tex}))
    objs.append(scn.mesh_object(m3, translation=(0.0, -10.0, -12.0),
                                interp_normals=False, miroir=True))
    return objs


def _scenes():
    objs = _objs()
    sc_m = scn.build_scene(objs, scn.default_light_intensity(),
                           merge_meshes=True)
    sc_s = scn.build_scene(_objs(), scn.default_light_intensity(),
                           merge_meshes=False)
    return sc_m, sc_s


def _rays():
    rng = np.random.default_rng(2)
    n = 256
    org = np.zeros((n, 3), np.float32)
    org[:, 2] = 40.0
    org += rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    # aim at the three mesh locations
    targets = np.array([[-8, -14, 0], [8, -14, 0], [0, -10, -12]],
                       np.float32)
    tgt = targets[rng.integers(0, 3, n)] \
        + rng.normal(0, 2.5, (n, 3)).astype(np.float32)
    d = tgt - org
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_merge_builds_one_mesh():
    sc_m, sc_s = _scenes()
    assert len(sc_m.meshes) == 1 and sc_m.meshes[0].world_space
    assert sc_m.meshes[0].group_rows is not None
    assert len(sc_s.meshes) == 3


def test_merged_hits_match_pergroup():
    sc_m, sc_s = _scenes()
    org, dirn = _rays()
    h_m = scn.intersect(sc_m, org, dirn)
    h_s = scn.intersect(sc_s, org, dirn)
    hit_m = np.asarray(h_m.hit)
    hit_s = np.asarray(h_s.hit)
    np.testing.assert_array_equal(hit_m, hit_s)
    assert hit_m.sum() > 50, 'vacuous: too few mesh hits'
    h = hit_m
    np.testing.assert_allclose(np.asarray(h_m.t)[h], np.asarray(h_s.t)[h],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(h_m.obj_id)[h],
                                  np.asarray(h_s.obj_id)[h])
    np.testing.assert_allclose(np.asarray(h_m.p)[h], np.asarray(h_s.p)[h],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(h_m.n)[h], np.asarray(h_s.n)[h],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(h_m.kd)[h],
                               np.asarray(h_s.kd)[h], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h_m.transp)[h],
                                  np.asarray(h_s.transp)[h])
    np.testing.assert_allclose(np.asarray(h_m.refr_index)[h],
                               np.asarray(h_s.refr_index)[h], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(h_m.miroir)[h],
                                  np.asarray(h_s.miroir)[h])


def test_merged_shadows_match():
    sc_m, sc_s = _scenes()
    org, dirn = _rays()
    h = scn.intersect(sc_s, org, dirn)
    p = np.asarray(h.p) + np.asarray(h.n) * 1e-3
    lvec = np.asarray(sc_s.center_light)[None, :] - p
    dist = np.linalg.norm(lvec, axis=-1)
    ldir = lvec / np.maximum(dist[:, None], 1e-9)
    b_m = np.asarray(scn.intersect_shadow(sc_m, jnp.asarray(p),
                                          jnp.asarray(ldir),
                                          jnp.asarray(dist)))
    b_s = np.asarray(scn.intersect_shadow(sc_s, jnp.asarray(p),
                                          jnp.asarray(ldir),
                                          jnp.asarray(dist)))
    agree = (b_m == b_s).mean()
    assert agree > 0.99, f'shadow agreement {agree}'


def test_merged_render_matches():
    sc_m, sc_s = _scenes()
    cam = pt.make_camera((0, 0, 40), (0, 0, -1), (0, 1, 0))
    cfg = pt.RenderConfig(width=64, height=48, nrays=2,
                          samples_per_wave=2)
    img_m = np.asarray(pt.Renderer(sc_m, cam, cfg).render().image)
    img_s = np.asarray(pt.Renderer(sc_s, cam, cfg).render().image)
    # identical sample sequences; only boundary-flip pixels may differ
    diff = np.abs(img_m - img_s)
    frac = (diff.max(axis=-1) > 1e-3 * (1.0 + img_s.max(axis=-1))).mean()
    assert frac < 0.01, f'{frac:.4f} of pixels differ'


def test_ghost_and_seg_meshes_stay_separate():
    objs = _objs()
    objs.append(scn.mesh_object(procgen.sphere_mesh(8, 8, radius=2.0),
                                translation=(0.0, -14.0, 10.0),
                                ghost=True))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    # ghost mesh must NOT be merged
    assert len(sc.meshes) == 2
    kinds = sorted(bool(m.world_space) for m in sc.meshes)
    assert kinds == [False, True]
    assert not mesh_mod.mergeable_spec(objs[-1])
