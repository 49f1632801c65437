"""HDR writer roundtrip + exportD/E autosave naming (VERDICT #9).

Reference: EncodeRadianceHDR (hdrwriter.h:5) and the per-frame autosave
slots exportD<frame>.jpg (progressive, Raytracer.cpp:1549-1558) /
exportE<frame>.jpg (offline, :1711-1756).
"""

import os
import subprocess
import sys

import numpy as np

from pathtracer_tpu.io import image as image_io


def test_hdr_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (24, 33, 3)).astype(np.float32) ** 2) * 500.0
    img[3:7, 4:9] = 0.0                       # runs of black (RLE run path)
    img[10] = 2.5                             # constant row (long runs)
    p = str(tmp_path / 'x.hdr')
    image_io.save_hdr(p, img)
    back = image_io.load_hdr(p)
    assert back.shape == img.shape
    # RGBE quantization: step = 2^e/256 <= 2*max/256 (floor encode)
    scale = np.maximum(img.max(-1, keepdims=True), 1e-9)
    np.testing.assert_allclose(back / scale, img / scale, atol=2.1 / 256)


def test_hdr_roundtrip_wide_dynamic_range(tmp_path):
    img = np.zeros((4, 8, 3), np.float32)
    img[0, 0] = [1e-6, 2e-6, 3e-6]
    img[1, 1] = [1e6, 2e5, 3e4]
    img[2, 2] = [1.0, 0.5, 0.25]
    p = str(tmp_path / 'y.hdr')
    image_io.save_hdr(p, img)
    back = image_io.load_hdr(p)
    for idx in [(0, 0), (1, 1), (2, 2)]:
        ref = img[idx]
        np.testing.assert_allclose(back[idx], ref,
                                   rtol=2 / 256 * (ref.max() / np.maximum(
                                       ref, 1e-30)).max(), atol=1e-12)


def test_cli_autosave_names(tmp_path):
    import pathtracer_tpu as pt
    from pathtracer_tpu.io import scene_json
    from pathtracer_tpu.render.renderer import RenderConfig
    from pathtracer_tpu.scene import scene as scn

    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = RenderConfig(width=24, height=16, nrays=2)
    spath = str(tmp_path / 'scene.json')
    scene_json.save_scene(spath, objs, scn.default_light_intensity(), cam,
                          cfg)
    out = str(tmp_path / 'out.png')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'pathtracer_tpu.cli', spath, out, '--cpu',
         '--progressive', '--autosave', '--frame', '7'],
        capture_output=True, text=True, cwd='/root/repo', env=env,
        timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / 'exportD7.jpg'))
    assert os.path.exists(str(tmp_path / 'exportE7.jpg'))


def test_cli_hdr_output(tmp_path):
    import pathtracer_tpu as pt
    from pathtracer_tpu.io import scene_json
    from pathtracer_tpu.render.renderer import RenderConfig
    from pathtracer_tpu.scene import scene as scn

    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = RenderConfig(width=24, height=16, nrays=2)
    spath = str(tmp_path / 'scene.json')
    scene_json.save_scene(spath, objs, scn.default_light_intensity(), cam,
                          cfg)
    out = str(tmp_path / 'out.hdr')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    res = subprocess.run(
        [sys.executable, '-m', 'pathtracer_tpu.cli', spath, out, '--cpu'],
        capture_output=True, text=True, cwd='/root/repo', env=env,
        timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    hdr = image_io.load_hdr(out)
    assert hdr.shape == (16, 24, 3)
    assert np.isfinite(hdr).all() and hdr.max() > 0
