"""`.scn` write-back (io.scn_export) round-trips with the importer.

Reference: Raytracer::save_scene / load_scene are inverse
(Raytracer.cpp:1096-1236); here save_scn(load_scn(f)) must re-parse to
the same scene, and a programmatic scene (keyframes, fog, lenticular,
mesh) must survive a save -> load cycle field-for-field.
"""

import numpy as np

from pathtracer_tpu.core import camera as cam_mod
from pathtracer_tpu.io import scn_export, scn_import
from pathtracer_tpu.render.renderer import RenderConfig
from pathtracer_tpu.scene import scene as scn

from test_scn_import import SCN


def _assert_specs_equal(a, b):
    assert a.obj_type == b.obj_type
    for f in ('miroir', 'ghost', 'transp', 'flip_normals', 'interp_normals',
              'display_edges', 'scale', 'refr_index'):
        assert getattr(a, f) == getattr(b, f), f
    for f in ('center', 'translation', 'kd', 'ks', 'ne', 'ksub'):
        np.testing.assert_allclose(getattr(a, f), getattr(b, f), atol=1e-6,
                                   err_msg=f)
    if a.obj_type == scn.SPHERE:
        np.testing.assert_allclose(a.radius, b.radius)
    if a.obj_type == scn.PLANE:
        np.testing.assert_allclose(a.normal, b.normal, atol=1e-6)


def test_reference_scn_roundtrip(tmp_path):
    """load -> save -> load of a reference-format file is a fixed point."""
    p1 = tmp_path / 'in.scn'
    p1.write_text(SCN)
    parsed1 = scn_import.load_scn(str(p1))
    p2 = tmp_path / 'out.scn'
    scn_export.save_scn(str(p2), *parsed1)
    parsed2 = scn_import.load_scn(str(p2))

    o1, li1, cam1, cfg1, ex1 = parsed1
    o2, li2, cam2, cfg2, ex2 = parsed2
    assert len(o1) == len(o2) == 4
    for a, b in zip(o1, o2):
        _assert_specs_equal(a, b)
    np.testing.assert_allclose(li1, li2)
    np.testing.assert_allclose(np.asarray(cam1.position),
                               np.asarray(cam2.position))
    np.testing.assert_allclose(float(cam1.fov), float(cam2.fov), atol=1e-6)
    assert (cfg1.width, cfg1.height, cfg1.nrays, cfg1.nb_bounces) \
        == (cfg2.width, cfg2.height, cfg2.nrays, cfg2.nb_bounces)
    assert ex1['fog'] == ex2['fog']

    # a second save of the re-parse is byte-identical (fixed point)
    p3 = tmp_path / 'out2.scn'
    scn_export.save_scn(str(p3), *parsed2)
    assert p2.read_text() == p3.read_text()


def test_programmatic_scene_roundtrip(tmp_path):
    """Keyframes, fog, lenticular camera, mirror/transp flags survive."""
    objs = [
        scn.sphere((10., 23., 15.), 10., kd=(1., 1., 1.)),       # light
        scn.sphere((0., 0., 0.), 1e6, flip_normals=True),        # dome
        scn.plane((0., 0., 0.), (0., 1., 0.), translation=(0., -27.3, 0.)),
        scn.sphere((0., -17., 0.), 10., kd=(.7, .3, .2), miroir=True,
                   keyframes={0.0: {'translation': (0., 0., 0.)},
                              10.0: {'translation': (5., 0., 0.),
                                     'scale': 2.0}}),
        scn.sphere((15., -17., 0.), 6., transp=True, refr_index=1.5,
                   ks=(.2, .2, .2), ne=(80., 80., 80.)),
    ]
    cam = cam_mod.make_camera((0, 1, 55), (0, 0, -1), (0, 1, 0),
                              fov=0.7, focus_distance=40.0, aperture=0.3,
                              is_lenticular=True, lenticular_nb_images=6,
                              lenticular_pixel_width=2)
    cfg = RenderConfig(width=640, height=360, nrays=32, nb_bounces=5,
                       sigma_filter=0.7, gamma=2.2,
                       double_frustum_start_t=3.5)
    extras = {'envmap_intensity': 2.5,
              'fog': {'density': 0.1, 'absorption': 0.4,
                      'density_decay': 0.02, 'absorption_decay': 0.02,
                      'type': 1, 'phase_type': 2}}
    p = tmp_path / 'prog.scn'
    scn_export.save_scn(str(p), objs, 2.5e9, cam, cfg, extras)
    o2, li2, cam2, cfg2, ex2 = scn_import.load_scn(str(p))

    assert len(o2) == 5
    for a, b in zip(objs, o2):
        _assert_specs_equal(a, b)
    np.testing.assert_allclose(li2, 2.5e9)
    assert cam2.is_lenticular and cam2.lenticular_nb_images == 6
    assert cam2.lenticular_pixel_width == 2
    np.testing.assert_allclose(float(cam2.aperture), 0.3, atol=1e-6)
    assert cfg2.nb_bounces == 5 and cfg2.nrays == 32
    np.testing.assert_allclose(cfg2.double_frustum_start_t, 3.5, atol=1e-6)
    assert ex2['fog']['type'] == 1 and ex2['fog']['phase_type'] == 2
    np.testing.assert_allclose(ex2['fog']['density'], 0.1, atol=1e-6)
    np.testing.assert_allclose(ex2['envmap_intensity'], 2.5, atol=1e-6)

    # keyframes: frame 10 carries translation + scale
    kf = o2[3].keyframes
    assert kf is not None and 10.0 in kf
    np.testing.assert_allclose(kf[10.0]['translation'], (5., 0., 0.),
                               atol=1e-6)
    np.testing.assert_allclose(kf[10.0]['scale'], 2.0)


def test_cli_save_scn(tmp_path):
    """`--save-scn` writes a re-loadable reference-format scene file."""
    import os
    import subprocess
    import sys

    import pathtracer_tpu as pt
    from pathtracer_tpu.io import scene_json

    objs = [scn.sphere((10., 23., 15.), 10.),
            scn.sphere((0., 0., 0.), 1e6, flip_normals=True),
            scn.sphere((0., -17., 0.), 10., kd=(.7, .3, .2))]
    cam = cam_mod.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = RenderConfig(width=24, height=16, nrays=2)
    spath = str(tmp_path / 'scene.json')
    scene_json.save_scene(spath, objs, scn.default_light_intensity(), cam,
                          cfg)
    out = str(tmp_path / 'out.png')
    scn_out = str(tmp_path / 'back.scn')
    res = subprocess.run(
        [sys.executable, '-m', 'pathtracer_tpu.cli', spath, out, '--cpu',
         '--save-scn', scn_out],
        capture_output=True, text=True, cwd='/root/repo',
        env=dict(os.environ, JAX_PLATFORMS='cpu'), timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out)
    o2, li2, cam2, cfg2, _ = scn_import.load_scn(scn_out)
    assert len(o2) == 3 and cfg2.width == 24 and cfg2.nrays == 2
    np.testing.assert_allclose(o2[2].kd, (.7, .3, .2), atol=1e-6)
