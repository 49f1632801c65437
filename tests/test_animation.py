"""Keyframe interpolation, rotated-object rendering, camera modes, video."""

import math
import os

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import camera as cam_mod
from pathtracer_tpu.core import rng_host, transform as tf
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.render.video import render_video
from pathtracer_tpu.scene import scene as scn


def test_slerp_endpoints_and_midpoint():
    m1 = tf.rotation_y(0.0)
    m2 = tf.rotation_y(math.pi / 2)
    np.testing.assert_allclose(tf.slerp_mat(m1, m2, 0.0), m1, atol=1e-6)
    np.testing.assert_allclose(tf.slerp_mat(m1, m2, 1.0), m2, atol=1e-6)
    np.testing.assert_allclose(tf.slerp_mat(m1, m2, 0.5),
                               tf.rotation_y(math.pi / 4), atol=1e-6)


def test_keyframe_clamping_and_lerp():
    kf = {0.0: {'translation': (0, 0, 0), 'scale': 1.0},
          10.0: {'translation': (10, 0, 0), 'scale': 3.0}}
    tr, rot, s = tf.interpolate_keyframes(kf, 5.0)
    np.testing.assert_allclose(tr, [5, 0, 0])
    assert np.isclose(s, 2.0)
    tr, _, s = tf.interpolate_keyframes(kf, -5.0)
    np.testing.assert_allclose(tr, [0, 0, 0])
    tr, _, s = tf.interpolate_keyframes(kf, 50.0)
    np.testing.assert_allclose(tr, [10, 0, 0])
    assert np.isclose(s, 3.0)


def test_animated_sphere_moves_between_frames():
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=2, nb_bounces=1)

    objs = scn.default_objects()
    objs.append(scn.sphere(
        (0.0, -17.0, 0.0), 8.0, kd=(0.9, 0.2, 0.2),
        keyframes={0.0: {'translation': (-12, 0, 0)},
                   10.0: {'translation': (12, 0, 0)}}))
    img0, _ = rnd.render_unsplatted(
        scn.build_scene(objs, scn.default_light_intensity(), frame=0.0),
        cam, cp, cfg)
    img1, _ = rnd.render_unsplatted(
        scn.build_scene(objs, scn.default_light_intensity(), frame=10.0),
        cam, cp, cfg)
    img0 = np.asarray(img0)
    img1 = np.asarray(img1)
    left = img0[:, :8, 0].sum()
    right = img0[:, 8:, 0].sum()
    assert left > right, "frame 0 sphere should sit left"
    left1 = img1[:, :8, 0].sum()
    right1 = img1[:, 8:, 0].sum()
    assert right1 > left1, "frame 10 sphere should sit right"


def test_rotated_scaled_object_renders():
    """Full rotation+scale transform path (non-identity matrices)."""
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=2, nb_bounces=2)
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 5.0, kd=(0.2, 0.8, 0.2),
                           rotation=tf.rotation_y(0.7), scale=1.8))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert not sc.identity_transform
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img)
    assert np.all(np.isfinite(img)) and img.max() > 0


def test_lenticular_differs_from_plain():
    cam_p = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cam_l = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0),
                           is_lenticular=True, lenticular_nb_images=4)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    cfg = rnd.RenderConfig(width=16, height=12, nrays=2, nb_bounces=1)
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    a, _ = rnd.render_unsplatted(sc, cam_p, cp, cfg)
    b, _ = rnd.render_unsplatted(sc, cam_l, cp, cfg)
    assert np.all(np.isfinite(np.asarray(b)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_render_video_writes_frames(tmp_path):
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=12, height=8, nrays=1, samples_per_wave=1)
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 8.0,
                           keyframes={0.0: {'translation': (-5, 0, 0)},
                                      1.0: {'translation': (5, 0, 0)}}))
    paths = render_video(objs, scn.default_light_intensity(), cam, cfg,
                         nb_frames=2, out_dir=str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ['exportE0.png',
                                                    'exportE1.png']
    assert all(os.path.exists(p) for p in paths)

    paths = render_video(objs, scn.default_light_intensity(), cam, cfg,
                         nb_frames=1, out_dir=str(tmp_path),
                         nbview_x=2, nbview_y=1, max_spacing_x=2.0)
    assert [os.path.basename(p) for p in paths] == [
        'exportE0_0_2_0_1.png', 'exportE0_1_2_0_1.png']
