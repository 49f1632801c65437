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
