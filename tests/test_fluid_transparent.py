"""Transparent fluid: union-exit semantics + refracting render."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import pointset as ps_mod
from pathtracer_tpu.scene import scene as scn


def test_union_exit_spans_overlapping_spheres():
    # three overlapping spheres along +z: union along the ray is [-1, 5]
    pts = np.array([[0, 0, 0], [0, 0, 2], [0, 0, 4]], np.float32)
    ps = ps_mod.fluid_pointset(pts, radius=1.2)
    org = jnp.asarray([[0.0, 0.0, -0.5]])     # inside the first sphere
    dirn = jnp.asarray([[0.0, 0.0, 1.0]])
    t_exit, idx, inside = ps_mod.sphere_union_exit(ps, org, dirn)
    assert bool(inside[0])
    # exit of the LAST sphere: z = 4 + 1.2 -> t = 4.5 + 1.2 = 5.7
    np.testing.assert_allclose(float(t_exit[0]), 5.7, atol=1e-4)
    assert int(idx[0]) == 2

    # a disjoint far sphere must NOT extend the union
    pts2 = np.array([[0, 0, 0], [0, 0, 10]], np.float32)
    ps2 = ps_mod.fluid_pointset(pts2, radius=1.0)
    t_exit2, _, _ = ps_mod.sphere_union_exit(ps2, org, dirn)
    np.testing.assert_allclose(float(t_exit2[0]), 1.5, atol=1e-4)


def test_transparent_fluid_renders():
    pts = (np.random.default_rng(0).uniform(0, 1, (150, 3)) * 12
           + np.array([-6, -24, -6])).astype(np.float32)
    objs = scn.default_objects()
    objs.append(scn.pointset_object(
        ps_mod.fluid_pointset(pts, radius=1.2, color=(0.4, 0.6, 0.9)),
        transp=True, refr_index=1.33))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert sc.pointsets[0].transparent
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    img, _ = rnd.render_unsplatted(sc, cam, cp,
                                   rnd.RenderConfig(width=16, height=12,
                                                    nrays=2, nb_bounces=3))
    img = np.asarray(img)
    assert np.all(np.isfinite(img)) and img.max() > 0
