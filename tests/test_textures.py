"""Texture channels: loading semantics, sampling, normal maps, alpha cutout."""

import os
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.models import texture as tex_mod
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn


def test_color_load_is_gamma_linearized(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 128
    p = str(tmp_path / 'c.png')
    Image.fromarray(img).save(p)
    out = tex_mod.load_color_image(p)
    np.testing.assert_allclose(out[0, 0, 0], (128 / 255.0) ** 2.2, rtol=1e-5)
    assert out[0, 0, 1] == 0.0


def test_normal_load_decodes_offset128(tmp_path):
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 128   # x = 0
    img[..., 1] = 128   # y = 0
    img[..., 2] = 255   # z = 127 -> unit z
    p = str(tmp_path / 'n.png')
    Image.fromarray(img).save(p)
    out = tex_mod.load_normal_image(p)
    np.testing.assert_allclose(out[0, 0], [0.0, 0.0, 1.0], atol=1e-6)


def test_sample_point_wrap():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 2, 3))
    v = tex_mod.sample_point(img, jnp.asarray([1.3]), jnp.asarray([0.0]))
    # u wraps to 0.3 -> x = int(0.3*(W-1)) = 0
    np.testing.assert_allclose(np.asarray(v)[0], [0, 1, 2])
    v = tex_mod.sample_point(img, jnp.asarray([-0.2]), jnp.asarray([1.0]))
    # u wraps to 0.8 -> x = 0 (W=2: 0.8*1=0.8 -> 0); v=1 wraps to 0 -> y=0
    np.testing.assert_allclose(np.asarray(v)[0], [0, 1, 2])


QUAD_OBJ = textwrap.dedent("""\
    mtllib quad.mtl
    v -1 0 -1
    v  1 0 -1
    v  1 0  1
    v -1 0  1
    vt 0 0
    vt 1 0
    vt 1 1
    vt 0 1
    vn 0 1 0
    usemtl mat
    f 1/1/1 2/2/1 3/3/1 4/4/1
    """)


def _textured_scene(tmp_path, mtl_extra, tex_writer):
    (tmp_path / 'quad.obj').write_text(QUAD_OBJ)
    (tmp_path / 'quad.mtl').write_text(
        "newmtl mat\nKd 1 1 1\n" + mtl_extra)
    tex_writer(tmp_path)
    # preserve_input to keep the quad exactly in the y=0 plane facing +y
    md = pt.load_mesh(str(tmp_path / 'quad.obj'), preserve_input=True)
    md.vertices = (md.vertices * 10.0 + np.array([0, -20, 0], np.float32))
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md))
    return scn.build_scene(objs, scn.default_light_intensity())


def test_alpha_cutout_lets_rays_through(tmp_path):
    # alpha map: left half black (cutout), right half white
    a = np.zeros((8, 8, 3), np.uint8)
    a[:, 4:] = 255

    def write(tp):
        Image.fromarray(a).save(str(tp / 'alpha.png'))

    sc = _textured_scene(tmp_path, "map_d alpha.png\n", write)
    mesh = sc.meshes[0]
    assert mesh.textures[0].alpha is not None

    # rays straight down onto the quad: u<0.5 should pass through (miss),
    # u>0.5 should hit the quad
    org = jnp.asarray([[-5.0, 0.0, 0.0], [5.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    hit = scn.intersect(sc, org, dirn)
    ids = np.asarray(hit.obj_id)
    # x=-5 -> u=... depends on uv orientation; exactly one of the two rays
    # must pass through the cutout to the ground plane (row 2), the other
    # stops at the quad (row 3)
    assert sorted(ids.tolist()) == [2, 3], f"obj ids {ids}"


def test_normal_map_perturbs_shading_normal(tmp_path):
    # normal map tilting +x strongly: r=255, g=128, b=128
    nmimg = np.zeros((4, 4, 3), np.uint8)
    nmimg[..., 0] = 255
    nmimg[..., 1] = 128
    nmimg[..., 2] = 128

    def write(tp):
        Image.fromarray(nmimg).save(str(tp / 'nm.png'))

    sc = _textured_scene(tmp_path, "map_Bump nm.png\n", write)
    org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hit = scn.intersect(sc, org, dirn)
    n = np.asarray(hit.n)[0]
    # decoded normal = normalize(127, 0, 0) in tangent space -> the shading
    # normal must lie along the (tangent) direction, i.e. mostly horizontal
    assert abs(n[1]) < 0.05, f"normal not perturbed: {n}"
    assert np.isclose(np.linalg.norm(n), 1.0, atol=1e-5)


def test_kd_texture_modulates_albedo(tmp_path):
    kdimg = np.zeros((8, 8, 3), np.uint8)
    kdimg[:, :, 1] = 255    # pure green texture

    def write(tp):
        Image.fromarray(kdimg).save(str(tp / 'kd.png'))

    sc = _textured_scene(tmp_path, "map_Kd kd.png\n", write)
    org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hit = scn.intersect(sc, org, dirn)
    kd = np.asarray(hit.kd)[0]
    np.testing.assert_allclose(kd, [0.0, 1.0, 0.0], atol=1e-5)


def _quad_mesh(tmp_path):
    (tmp_path / 'quad.obj').write_text(QUAD_OBJ)
    (tmp_path / 'quad.mtl').write_text("newmtl mat\nKd 1 1 1\n")
    md = pt.load_mesh(str(tmp_path / 'quad.obj'), preserve_input=True)
    md.vertices = (md.vertices * 10.0 + np.array([0, -20, 0], np.float32))
    return md


def _down_rays(xz_list):
    org = jnp.asarray([[x, 0.0, z] for x, z in xz_list], jnp.float32)
    dirn = jnp.asarray([[0.0, -1.0, 0.0]] * len(xz_list), jnp.float32)
    return org, dirn


def test_transp_texture_gates_transparency(tmp_path):
    # red channel: u<0.5 dark (transparent, getBool red*mult < 0.5),
    # u>=0.5 bright (opaque)
    img = np.zeros((8, 8, 3), np.float32)
    img[:, 4:, 0] = 1.0
    md = _quad_mesh(tmp_path)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, textures={'transp': img}))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    org, dirn = _down_rays([(-5.0, 0.0), (5.0, 0.0)])
    hit = scn.intersect(sc, org, dirn)
    tr = np.asarray(hit.transp)
    ids = np.asarray(hit.obj_id)
    assert (ids == 3).all(), f"rays must hit the quad, got {ids}"
    assert sorted(tr.tolist()) == [False, True], f"transp {tr}"


def test_refr_texture_scales_index(tmp_path):
    img = np.full((4, 4, 3), 0.5, np.float32)
    md = _quad_mesh(tmp_path)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, refr_index=1.4,
                                textures={'refr': img}))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    org, dirn = _down_rays([(0.0, 0.0)])
    hit = scn.intersect(sc, org, dirn)
    # getValRed: red * multiplier (the constant refr_index)
    np.testing.assert_allclose(np.asarray(hit.refr_index)[0], 0.5 * 1.4,
                               rtol=1e-6)


def test_ksub_texture_modulates_subsurface(tmp_path):
    img = np.full((4, 4, 3), 0.5, np.float32)
    md = _quad_mesh(tmp_path)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, ksub=(1.0, 0.8, 0.6),
                                textures={'ksub': img}))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    org, dirn = _down_rays([(0.0, 0.0)])
    hit = scn.intersect(sc, org, dirn)
    np.testing.assert_allclose(np.asarray(hit.ksub)[0], [0.5, 0.4, 0.3],
                               rtol=1e-6)


def test_seg_colors_formula():
    from pathtracer_tpu.io import obj as obj_io
    for u in (0, 1, 3, 17, 255):
        r = ((u * u * (u + 2) * 123 + 51) % 1000) / 1000.0
        g = ((u * (u + 7) * 456 + 266) % 1000) / 1000.0
        b = ((u * u * u * 5 + u * 33 + 687) % 1000) / 1000.0
        np.testing.assert_allclose(obj_io.seg_colors([u])[0], [r, g, b],
                                   rtol=1e-6)


def test_seg_file_overrides_kd(tmp_path):
    from pathtracer_tpu.io import obj as obj_io
    md = _quad_mesh(tmp_path)           # 2 triangles (quad fan)
    seg = tmp_path / 'quad.seg'
    seg.write_text("3\n7\n")
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, seg_path=str(seg)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    # one ray in each fan triangle: tri0 covers z<x region near z=-5,
    # tri1 the other; sample two interior points on opposite sides
    org, dirn = _down_rays([(5.0, -5.0), (-5.0, 5.0)])
    hit = scn.intersect(sc, org, dirn)
    kds = np.asarray(hit.kd)
    expected = {tuple(np.round(obj_io.seg_colors([3])[0], 5)),
                tuple(np.round(obj_io.seg_colors([7])[0], 5))}
    got = {tuple(np.round(k, 5)) for k in kds}
    assert got == expected, f"facecolors {got} != {expected}"


def test_display_edges_blackens_borders(tmp_path):
    md = _quad_mesh(tmp_path)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, display_edges=True))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    # near the quad border z=-10 (scaled: -10 local) -> bary gamma < 0.05
    # on a real polygon edge -> black; interior stays lit; the fan's
    # interior diagonal must NOT be drawn
    org, dirn = _down_rays([(0.0, -9.9), (4.0, -4.0), (0.2, 0.0)])
    hit = scn.intersect(sc, org, dirn)
    kds = np.asarray(hit.kd)
    assert (kds[0] == 0.0).all(), f"border not black: {kds[0]}"
    assert (kds[1] > 0.0).all(), f"interior blackened: {kds[1]}"
    assert (kds[2] > 0.0).all(), f"fan diagonal drawn: {kds[2]}"


def test_sphere_spherical_uv_texture():
    from pathtracer_tpu.models import texture as tex_mod
    img = np.zeros((4, 4, 3), np.float32)
    img[:] = np.arange(16, dtype=np.float32).reshape(4, 4, 1) / 16.0
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, 0.0, 0.0), 10.0, kd=(1.0, 0.5, 1.0),
                           textures={'kd': img}))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    org = jnp.asarray([[50.0, 0.0, 0.0]], jnp.float32)
    dirn = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    hit = scn.intersect(sc, org, dirn)
    # hit at (10,0,0): N=(1,0,0) -> theta=u=0.5, phi=v=0.5
    want = np.asarray(tex_mod.sample_point(
        jnp.asarray(img), jnp.asarray([0.5]), jnp.asarray([0.5])))[0]
    want = want * np.asarray([1.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(hit.kd)[0], want, rtol=1e-5)


def test_plane_uv_texture():
    from pathtracer_tpu.models import texture as tex_mod
    img = np.zeros((5, 5, 3), np.float32)
    img[:] = np.arange(25, dtype=np.float32).reshape(5, 5, 1) / 25.0
    objs = scn.default_objects()
    objs[2] = scn.plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                        translation=(0.0, -27.3, 0.0),
                        textures={'kd': img})
    sc = scn.build_scene(objs, scn.default_light_intensity())
    org, dirn = _down_rays([(2.5, 7.0)])
    hit = scn.intersect(sc, org, dirn)
    # local P = (2.5, 0, 7.0) -> u = 0.25, v = 0.7
    want = np.asarray(tex_mod.sample_point(
        jnp.asarray(img), jnp.asarray([0.25]), jnp.asarray([0.7])))[0]
    np.testing.assert_allclose(np.asarray(hit.kd)[0], want, rtol=1e-5)


def test_textures_scene_json_roundtrip(tmp_path):
    from pathtracer_tpu.io import scene_json
    from pathtracer_tpu.render.renderer import RenderConfig
    img = np.full((4, 4, 3), 128, np.uint8)
    p = str(tmp_path / 'kd.png')
    Image.fromarray(img).save(p)
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, textures={'kd': p}))
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    sp = str(tmp_path / 's.json')
    scene_json.save_scene(sp, objs, 1e9, cam, RenderConfig(width=8, height=8))
    objs2, _, _, _, _ = scene_json.load_scene(sp)
    assert objs2[3].textures == {'kd': p}


def test_sample_bilinear_interpolates():
    img = jnp.asarray(np.array(
        [[[0, 0, 0], [1, 1, 1]],
         [[2, 2, 2], [3, 3, 3]]], np.float32))
    # texel centers reproduce point sampling
    for u, v, want in ((0.0, 0.0, 0.0), (1.0 - 1e-6, 0.0, 1.0),
                       (0.0, 1.0 - 1e-6, 2.0)):
        got = tex_mod.sample_bilinear(img, jnp.asarray([u]),
                                      jnp.asarray([v]))
        np.testing.assert_allclose(np.asarray(got)[0, 0], want, atol=1e-4)
    # midpoint blends all four texels
    got = tex_mod.sample_bilinear(img, jnp.asarray([0.5]),
                                  jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(got)[0, 0], 1.5, atol=1e-6)


def test_atlas_matches_pergroup_sampling():
    rng = np.random.default_rng(11)
    imgs = [rng.random((6, 4, 3)).astype(np.float32), None,
            rng.random((3, 8, 3)).astype(np.float32)]
    at = tex_mod.build_atlas(imgs)
    assert at is not None
    n = 64
    u = rng.random(n).astype(np.float32)
    v = rng.random(n).astype(np.float32)
    grp = rng.integers(0, 3, n).astype(np.int32)
    val, has = tex_mod.sample_atlas(at, jnp.asarray(grp), jnp.asarray(u),
                                    jnp.asarray(v))
    val = np.asarray(val)
    has = np.asarray(has)
    want_has = np.asarray([imgs[g] is not None for g in grp])
    np.testing.assert_array_equal(has, want_has)
    for g, im in enumerate(imgs):
        sel = grp == g
        if im is None or not sel.any():
            continue
        ref = np.asarray(tex_mod.sample_point(
            jnp.asarray(im), jnp.asarray(u[sel]), jnp.asarray(v[sel])))
        np.testing.assert_array_equal(val[sel], ref)
    # bilinear atlas path stays inside the group's own rows
    valb, _ = tex_mod.sample_atlas(at, jnp.asarray(grp), jnp.asarray(u),
                                   jnp.asarray(v), bilinear=True)
    valb = np.asarray(valb)
    for g, im in enumerate(imgs):
        sel = grp == g
        if im is None or not sel.any():
            continue
        refb = np.asarray(tex_mod.sample_bilinear(
            jnp.asarray(im), jnp.asarray(u[sel]), jnp.asarray(v[sel])))
        np.testing.assert_allclose(valb[sel], refb, atol=1e-6)


def test_atlas_scene_matches_pergroup(tmp_path):
    kdimg = np.zeros((8, 8, 3), np.uint8)
    kdimg[:, :4, 0] = 255
    kdimg[:, 4:, 2] = 255

    def write(tp):
        Image.fromarray(kdimg).save(str(tp / 'kd.png'))

    def build(use_atlas):
        (tmp_path / 'quad.obj').write_text(QUAD_OBJ)
        (tmp_path / 'quad.mtl').write_text(
            "newmtl mat\nKd 1 1 1\nmap_Kd kd.png\n")
        write(tmp_path)
        md = pt.load_mesh(str(tmp_path / 'quad.obj'), preserve_input=True)
        md.vertices = (md.vertices * 10.0
                       + np.array([0, -20, 0], np.float32))
        objs = scn.default_objects()
        objs.append(scn.mesh_object(md, use_atlas=use_atlas))
        return scn.build_scene(objs, scn.default_light_intensity())

    sc0 = build(False)
    sc1 = build(True)
    assert sc1.meshes[0].atlases and sc1.meshes[0].atlases[0] is not None
    org, dirn = _down_rays([(-5.0, 0.0), (5.0, 0.0), (2.0, 3.0)])
    h0 = scn.intersect(sc0, org, dirn)
    h1 = scn.intersect(sc1, org, dirn)
    np.testing.assert_array_equal(np.asarray(h0.kd), np.asarray(h1.kd))
    np.testing.assert_array_equal(np.asarray(h0.transp),
                                  np.asarray(h1.transp))
