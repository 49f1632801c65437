"""Point sets (disk splats, normal estimation) and yarn cylinders."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import pointset as ps_mod
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.scene import yarns as yarn_mod


def test_xyz_load_column_mapping(tmp_path):
    p = tmp_path / 'pts.xyz'
    p.write_text('1 2 3 255 0 0\n4 5 6 0 255 0\n')
    pts, nrm, col = ps_mod.load_xyz(str(p), [0, 1, 2, 6, 7, 8],
                                    centered=False)
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_allclose(col, [[1, 0, 0], [0, 1, 0]], atol=1e-6)
    assert not nrm.any()


def test_normal_estimation_planar_cloud():
    rng = np.random.default_rng(0)
    pts = np.zeros((200, 3), np.float32)
    pts[:, 0] = rng.uniform(-1, 1, 200)
    pts[:, 2] = rng.uniform(-1, 1, 200)   # points in the y=0 plane
    nrm, radii = ps_mod.estimate_normals(pts)
    assert np.all(np.abs(nrm[:, 1]) > 0.99), "normals should be +-y"
    assert np.all(radii > 0)


def test_pointset_renders_disks():
    # a small grid of points forming a plane patch facing the camera
    xs, ys = np.meshgrid(np.linspace(-8, 8, 20), np.linspace(-22, -10, 20))
    pts = np.stack([xs.ravel(), ys.ravel(),
                    np.zeros(400, np.float32)], axis=-1).astype(np.float32)
    colors = np.full((400, 3), 0.8, np.float32)
    objs = scn.default_objects()
    objs.append(scn.pointset_object({'points': pts, 'colors': colors}))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert len(sc.pointsets) == 1

    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=4, nb_bounces=2)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    # the patch faces +z toward the camera and is lit -> visibly bright
    assert img[2:6, 6:10].mean() > 0


def test_yarn_parse_and_render(tmp_path):
    p = tmp_path / 'w.yarn'
    # 1 yarn, 3 points -> 2 segments
    p.write_text('1\n3\n-0.2 -0.35 0\n0 -0.3 0\n0.2 -0.35 0\n')
    seg_a, seg_b = yarn_mod.load_yarn(str(p))
    assert seg_a.shape == (2, 3)
    np.testing.assert_allclose(seg_a[0], [-10, -17.5, 0])  # x50 scale

    objs = scn.default_objects()
    objs.append(scn.yarn_object(str(p), kd=(0.8, 0.6, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert len(sc.yarns) == 1
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=4, nb_bounces=2)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    assert np.all(np.isfinite(np.asarray(img)))


def test_cylinder_sweep_geometry():
    """Ray perpendicular to a unit cylinder axis hits at distance d - r."""
    seg_a = np.array([[0.0, -1.0, 0.0]], np.float32)
    seg_b = np.array([[0.0, 1.0, 0.0]], np.float32)
    ya = yarn_mod.upload_yarns(seg_a, seg_b, 0, radius=0.5)
    org = jnp.asarray([[5.0, 0.0, 0.0]])
    dirn = jnp.asarray([[-1.0, 0.0, 0.0]])
    t, idx, s = yarn_mod.cylinder_sweep(ya, org, dirn,
                                        jnp.full((1,), 1e30))
    assert np.isclose(float(t[0]), 4.5, atol=1e-5)
    assert int(idx[0]) == 0
    assert np.isclose(float(s[0]), 1.0, atol=1e-5)  # hits mid-axis (s from A)
    # ray missing the finite extent
    org2 = jnp.asarray([[5.0, 3.0, 0.0]])
    t2, _, _ = yarn_mod.cylinder_sweep(ya, org2, dirn, jnp.full((1,), 1e30))
    assert float(t2[0]) > 1e29
