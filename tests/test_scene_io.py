"""Scene JSON round-trip + headless CLI end-to-end."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.io import scene_json
from pathtracer_tpu.render.renderer import RenderConfig
from pathtracer_tpu.scene import scene as scn


def _demo_scene(tmp_path):
    (tmp_path / 'tri.obj').write_text('v -1 0 -1\nv 1 0 -1\nv 0 0 1\nf 1 2 3\n')
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2),
                           ks=(0.1, 0.1, 0.1), ne=(30.0, 30.0, 30.0)))
    objs.append(scn.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    md_spec = scn.mesh_object(pt.load_mesh(str(tmp_path / 'tri.obj'),
                                           scaling=10.0,
                                           offset=(10.0, -20.0, 0.0)))
    md_spec.mesh_path = 'tri.obj'
    md_spec.mesh_scaling = 10.0
    md_spec.mesh_offset = (10.0, -20.0, 0.0)
    objs.append(md_spec)
    return objs


def test_roundtrip(tmp_path):
    objs = _demo_scene(tmp_path)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = RenderConfig(width=24, height=16, nrays=2)
    path = str(tmp_path / 'scene.json')
    scene_json.save_scene(path, objs, scn.default_light_intensity(), cam, cfg)

    objs2, li2, cam2, cfg2, extras = scene_json.load_scene(path)
    assert len(objs2) == len(objs)
    assert cfg2.width == 24 and cfg2.nrays == 2
    np.testing.assert_allclose(li2, scn.default_light_intensity(), rtol=1e-6)
    assert objs2[3].kd == [0.7, 0.3, 0.2] or tuple(objs2[3].kd) == (0.7, 0.3, 0.2)
    assert objs2[4].miroir
    assert objs2[5].obj_type == scn.MESH
    assert objs2[5].mesh_data.num_triangles == 1

    # both scenes must build and agree structurally
    sc1 = scn.build_scene(objs, scn.default_light_intensity())
    sc2 = scn.build_scene(objs2, li2)
    np.testing.assert_allclose(np.asarray(sc1.kd), np.asarray(sc2.kd))
    np.testing.assert_allclose(np.asarray(sc1.center), np.asarray(sc2.center))


def test_cli_renders(tmp_path):
    objs = _demo_scene(tmp_path)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = RenderConfig(width=24, height=16, nrays=2)
    spath = str(tmp_path / 'scene.json')
    scene_json.save_scene(spath, objs, scn.default_light_intensity(), cam, cfg)
    out = str(tmp_path / 'out.png')

    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'pathtracer_tpu.cli', spath, out, '--cpu'],
        capture_output=True, text=True, cwd='/root/repo', env=env,
        timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out)
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape == (16, 24, 3)
    assert img.max() > 0, "CLI render came out black"


def test_name_substitution(tmp_path):
    (tmp_path / 'model_A.obj').write_text('v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n')
    objs = scn.default_objects()
    spec = scn.mesh_object(pt.load_mesh(str(tmp_path / 'model_A.obj')))
    spec.mesh_path = 'model_#.obj'
    objs.append(spec)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    path = str(tmp_path / 's.json')
    scene_json.save_scene(path, objs, 1e6, cam, RenderConfig(width=8, height=8))
    objs2, *_ = scene_json.load_scene(path, name_subst='A')
    assert objs2[3].mesh_data.num_triangles == 1
