"""Transparent meshes: ObjectSpec transp/refr_index must reach mesh hits.

Round-1 defect (ADVICE.md high): upload_mesh hardcoded g_transp=False /
g_refr=1.3, so a scene-JSON mesh with 'transp': true silently rendered
as opaque diffuse (the reference's per-Object transp/refr fields,
Geometry.h:418-433, apply to every group unless a texture channel
overrides).
"""

import textwrap

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.io import obj as obj_io
from pathtracer_tpu.scene import scene as scn

CUBE_OBJ = textwrap.dedent("""\
    v -1 -1 -1
    v  1 -1 -1
    v  1  1 -1
    v -1  1 -1
    v -1 -1  1
    v  1 -1  1
    v  1  1  1
    v -1  1  1
    f 1 4 3 2
    f 5 6 7 8
    f 1 2 6 5
    f 2 3 7 6
    f 4 8 7 3
    f 1 5 8 4
    """)


def _cube_scene(tmp_path, **mesh_kw):
    (tmp_path / 'cube.obj').write_text(CUBE_OBJ)
    md = obj_io.load_mesh(str(tmp_path / 'cube.obj'), scaling=14.0,
                          offset=(0.0, -17.0, 0.0))
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, **mesh_kw))
    return scn.build_scene(objs, scn.default_light_intensity())


def test_mesh_transp_refr_propagate(tmp_path):
    sc = _cube_scene(tmp_path, transp=True, refr_index=1.4)
    n = 8
    org = jnp.broadcast_to(jnp.asarray([0.0, -17.0, 50.0]), (n, 3))
    dirn = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    hit = scn.intersect(sc, org, dirn)
    assert bool(hit.hit[0])
    assert int(hit.obj_id[0]) == 3            # the mesh row
    assert bool(hit.transp[0]), 'mesh transp flag was dropped'
    np.testing.assert_allclose(np.asarray(hit.refr_index), 1.4, rtol=1e-6)


def test_mesh_opaque_default(tmp_path):
    sc = _cube_scene(tmp_path)
    org = jnp.asarray([[0.0, -17.0, 50.0]])
    dirn = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = scn.intersect(sc, org, dirn)
    assert bool(hit.hit[0]) and not bool(hit.transp[0])


def test_transparent_mesh_refracts(tmp_path):
    """A transparent cube in front of a red wall: rays through the cube
    must still reach the red wall (Fresnel refraction path), not shade the
    cube as a diffuse surface."""
    (tmp_path / 'cube.obj').write_text(CUBE_OBJ)
    md = obj_io.load_mesh(str(tmp_path / 'cube.obj'), scaling=10.0,
                          offset=(0.0, -17.0, 10.0))
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, transp=True, refr_index=1.2))
    objs.append(scn.sphere((0.0, -17.0, -40.0), 12.0, kd=(0.9, 0.05, 0.05)))
    sc = scn.build_scene(objs, scn.default_light_intensity())

    import pathtracer_tpu.render.renderer as rnd
    from pathtracer_tpu.core import rng_host
    W, H = 16, 12
    cam = pt.make_camera((0, -17, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=8, nb_bounces=4)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img)
    center = img[H // 2 - 2:H // 2 + 2, W // 2 - 2:W // 2 + 2]
    # the red ball must dominate through the glass cube
    assert center[..., 0].mean() > 2.0 * center[..., 1].mean(), (
        center.mean(axis=(0, 1)))
