"""LEAN big-mesh upload: cluster-tier meshes drop soup/BVH/attribute
duplicates (everything rides packed clusters + shade_pack) and render
identically to the full upload.

Reference counterpart: the single triangleSoup copy the C++ keeps
(TriangleMesh.cpp:813-829); here the packed cluster A-matrices replace
even that at render time (VERDICT r03 #4)."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import mesh as mesh_mod
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen


def _mesh_md():
    # > PACKET_MAX_TRIS so the lean gate opens
    return procgen.sphere_mesh(80, 80, radius=10.0, displace_amp=0.15)


def test_lean_fields_dropped():
    md = _mesh_md()
    m = mesh_mod.upload_mesh(md, obj_row=0, use_cluster=True)
    assert m.num_triangles > mesh_mod.PACKET_MAX_TRIS
    assert m.soup is None and m.bvh is None
    assert m.n0 is None and m.uv0 is None and m.t0 is None
    assert m.group is None
    assert m.shade_pack is not None
    cols = {nm for nm, _, _ in m.shade_cols}
    assert 'bary' in cols and 'n0' in cols
    # num_triangles must survive without the soup
    assert m.num_triangles == md.vtx_idx.shape[0]

    full = mesh_mod.upload_mesh(md, obj_row=0, use_cluster=True, lean=False)
    assert full.soup is not None and full.bvh is not None
    # lean drops every duplicated byte: device footprint strictly smaller
    import jax
    nbytes = lambda m_: sum(x.nbytes for x in jax.tree.leaves(m_)
                            if hasattr(x, 'nbytes'))
    assert nbytes(m) < 0.6 * nbytes(full)


def test_lean_render_matches_full(tmp_path):
    md = _mesh_md()
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=20, height=14, nrays=2,
                           samples_per_wave=2, nb_bounces=2)

    imgs = {}
    for lean in (True, False):
        objs = scn.default_objects()
        objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
        sc = scn.build_scene(objs, scn.default_light_intensity())
        m = sc.meshes[0]
        m2 = mesh_mod.upload_mesh(md, obj_row=m.obj_row,
                                  use_cluster=True, lean=lean)
        sc = sc.replace(meshes=(m2,))
        imgs[lean] = np.asarray(pt.Renderer(sc, cam, cfg).render().display())

    # identical kernels + identical shade_pack rows -> bit-identical
    np.testing.assert_array_equal(imgs[True], imgs[False])
    # and the mesh is actually in frame (non-vacuous)
    assert imgs[True].std() > 0.01
