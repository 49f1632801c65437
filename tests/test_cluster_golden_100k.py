"""Golden render at 100k triangles through the REAL tier dispatch
(VERDICT r03 weak #4: the config-ladder stand-ins take the brute tier;
this exercises the cluster tier's full scene path — auto LEAN upload,
hierarchical cull, windowed sweep, shade_pack bary recompute — against
the lockstep-BVH tier on the same mesh).

Interpret mode (forced CPU) runs the same kernel logic the TPU compiles;
visibility-boundary f32 flips are the only permitted difference, and at
this resolution there are none."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import mesh as mesh_mod
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.utils import procgen


def test_cluster_golden_100k():
    md = procgen.sphere_mesh(230, 230, radius=10.0, displace_amp=0.2)
    assert md.num_triangles > 100_000
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=48, height=36, nrays=1,
                           samples_per_wave=1, nb_bounces=2)

    imgs = {}
    for use_cluster in (True, False):
        objs = scn.default_objects()
        objs.append(scn.mesh_object(md, translation=(0.0, -15.0, 0.0)))
        sc = scn.build_scene(objs, scn.default_light_intensity())
        m2 = mesh_mod.upload_mesh(md, obj_row=sc.meshes[0].obj_row,
                                  use_cluster=use_cluster)
        if use_cluster:
            assert m2.soup is None      # the auto-LEAN path engaged
        sc = sc.replace(meshes=(m2,))
        imgs[use_cluster] = np.asarray(
            pt.Renderer(sc, cam, cfg).render().display())

    # the mesh is actually in frame and shaded (non-vacuous)
    assert imgs[True].std() > 0.05
    eq = np.isclose(imgs[True], imgs[False], rtol=1e-4,
                    atol=1e-4).all(axis=-1)
    assert eq.mean() > 0.999, eq.mean()
