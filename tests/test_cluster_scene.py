"""Big-mesh cluster tier wired into the scene pipeline.

A >PACKET_MAX_TRIS mesh rendered with use_cluster=True (interpret mode
off-TPU) must produce the same image as the XLA lockstep BVH path — same
visibility, same shading — through the full Renderer stack (primary,
bounce and shadow rays all route through _mesh_closest_hit,
scene.py:493-537).
"""

import numpy as np
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.io import obj as obj_io
from pathtracer_tpu.ops import pallas_cluster
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import mesh as mesh_mod
from pathtracer_tpu.scene import scene as scn


def _wall_obj(tmp_path, G=72):
    """(G+1)^2-vertex bumpy WALL facing the camera (+z) -> 2*G^2 tris.

    A wall, not a floor: the camera at +z must actually HIT the mesh —
    an out-of-frame mesh makes the backend comparison vacuous."""
    lines = []
    xs = np.linspace(-1.0, 1.0, G + 1)
    for i in range(G + 1):
        for j in range(G + 1):
            x, y = xs[i], xs[j]
            z = 0.12 * np.sin(x * 9.0) * np.cos(y * 7.0)
            lines.append(f'v {x} {y} {z}')
    for i in range(G):
        for j in range(G):
            a = i * (G + 1) + j + 1
            lines.append(f'f {a} {a + G + 1} {a + G + 2} {a + 1}')
    p = tmp_path / 'wall.obj'
    p.write_text('\n'.join(lines) + '\n')
    return str(p)


def test_cluster_tier_matches_bvh_path(tmp_path):
    md = obj_io.load_mesh(_wall_obj(tmp_path), scaling=26.0,
                          offset=(0.0, 0.0, 0.0))
    assert md.num_triangles > mesh_mod.PACKET_MAX_TRIS

    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, kd=(0.6, 0.4, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    mesh = sc.meshes[0]
    assert not mesh.use_cluster          # CPU default keeps the XLA path

    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))

    # the comparison is only meaningful if primaries actually HIT the
    # mesh — guard against out-of-frame vacuity
    import jax.numpy as jnp
    from pathtracer_tpu.core import camera as cam_mod
    W, H = 20, 14
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
    z = jnp.zeros((W * H,))
    org, dirn = cam_mod.generate_rays(
        cam, jnp.asarray(ii.reshape(-1), jnp.float32),
        jnp.asarray(jj.reshape(-1), jnp.float32), z, z, z, z, W, H)
    hit = scn.intersect(sc, org, dirn)
    mesh_hits = int((np.asarray(hit.obj_id) == mesh.obj_row).sum())
    # the default scene's spheres occlude most of the wall; ~10% of
    # primaries reaching it is plenty to make the comparison meaningful
    assert mesh_hits >= 20, mesh_hits

    cfg = rnd.RenderConfig(width=W, height=H, nrays=2,
                           samples_per_wave=2, nb_bounces=2)
    img_bvh = np.asarray(pt.Renderer(sc, cam, cfg).render().display())

    tri_verts = md.vertices[md.vtx_idx]
    cm = pallas_cluster.build_clustered(tri_verts)
    sc2 = sc.replace(meshes=(mesh.replace(
        clustered=pallas_cluster.cluster_arrays(cm),
        use_cluster=True,
        n_clusters=cm.n_clusters,
        cluster_top_max_leaf=cm.top_max_leaf,
    ),))
    img_cl = np.asarray(pt.Renderer(sc2, cam, cfg).render().display())

    # identical sampling decisions except f32 visibility-boundary flips:
    # demand near-total pixel agreement
    close = np.isclose(img_bvh, img_cl, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.98, close.mean()
    np.testing.assert_allclose(img_bvh[close], img_cl[close],
                               rtol=1e-4, atol=1e-4)
