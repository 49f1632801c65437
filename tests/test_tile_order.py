"""Tile-major ray ordering must produce the identical image."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn


def test_tiled_render_matches_row_major():
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))

    def render(ts):
        cfg = rnd.RenderConfig(width=32, height=16, nrays=2,
                               samples_per_wave=2, tile_size=ts)
        return np.asarray(pt.Renderer(sc, cam, cfg).render().display())

    a = render(0)
    b = render(8)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_sorted_rays_match_unsorted():
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2),
                           ks=(0.1, 0.1, 0.1), ne=(30.0, 30.0, 30.0)))
    objs.append(scn.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))

    def render(sort):
        cfg = rnd.RenderConfig(width=24, height=16, nrays=2,
                               samples_per_wave=2, sort_rays=sort)
        return np.asarray(pt.Renderer(sc, cam, cfg).render().display())

    np.testing.assert_allclose(render(False), render(True), atol=2e-6)
