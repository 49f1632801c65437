"""Cluster-tier backface culling: exactness + gating.

The normal-bound cull (ops/pallas_cluster.ClusteredMesh.nrm) may only
fire on closed, consistently oriented, fully opaque meshes, where it is
EXACT for rays originating outside the surface (the first hit of such a
ray is always front-facing, so clusters that are entirely back-facing
for a ray's direction can never hold its closest hit — and for
occlusion, any in-range hit implies an in-range front-facing entry hit).
The reference's Embree traversal is two-sided (TriangleMesh.cpp:
1133-1235); this is a TPU-tier optimization whose soundness rests on the
gates tested here (scene/topology.closed_orientation +
scene/mesh.upload_mesh + scene gates).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.scene import mesh as mesh_mod
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.scene import topology as tp
from pathtracer_tpu.utils import procgen


def _outside_and_escaping_rays(cm, n, rng, radius=10.0):
    """Half rays from a far shell aimed inward, half REAL bounce-style
    rays: traced to the surface, offset outward along the geometric
    normal, directed into the outward hemisphere (the measured
    bounce-sweep dominator class).  Origins must genuinely be OUTSIDE
    the closed surface — naive 'radius*1.005' shells sit INSIDE the
    displaced bumps (displacement reaches 1.45x the base radius) where
    back-face hits are legitimate and the cull-parity property does not
    apply."""
    o = rng.normal(size=(n, 3))
    o /= np.linalg.norm(o, axis=1, keepdims=True)
    o *= 3.0 * radius
    tgt = rng.normal(size=(n, 3)) * 0.5 * radius
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m = n // 2
    # trace the first half to the surface (cull off) and relaunch
    t, tri, _, _ = pc.two_level_hit(
        cm, jnp.asarray(o[:m], jnp.float32), jnp.asarray(d[:m], jnp.float32),
        jnp.full((m,), 1e6, jnp.float32), interpret=True,
        backface_cull=False)
    t = np.asarray(t)
    tri = np.asarray(tri)
    hitm = tri >= 0
    tv = cm.host_tris[np.maximum(tri, 0)]
    gn = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
    # orient the geometric normal against the incoming ray (outward side)
    flip_in = np.sum(gn * d[:m], axis=1) > 0
    gn[flip_in] *= -1.0
    p = o[:m] + t[:, None] * d[:m] + 1e-3 * gn
    nd = gn + 0.8 * rng.normal(size=(m, 3))
    nd /= np.linalg.norm(nd, axis=1, keepdims=True)
    below = np.sum(nd * gn, axis=1) < 0
    nd[below] *= -1.0
    o[:m] = np.where(hitm[:, None], p, o[:m])
    d[:m] = np.where(hitm[:, None], nd, d[:m])
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def test_closed_orientation_detector():
    md = procgen.sphere_mesh(32, 32, radius=5.0, displace_amp=0.25)
    s = tp.closed_orientation(md.vertices, md.vtx_idx)
    assert s in (-1, 1)
    # flipping the winding flips the orientation sign
    assert tp.closed_orientation(md.vertices, md.vtx_idx[:, ::-1]) == -s
    # open surface -> 0
    t = procgen.terrain_mesh(24)
    assert tp.closed_orientation(t.vertices, t.vtx_idx) == 0
    # a closed mesh with one hole -> 0
    assert tp.closed_orientation(md.vertices, md.vtx_idx[1:]) == 0


def test_two_level_hit_backface_parity():
    """With the cull on, (t, tri) winners are IDENTICAL for outside +
    escaping rays on a closed sphere — both the dense cull (< 256
    clusters) and the hierarchical cull path."""
    rng = np.random.default_rng(0)
    # dense path
    md = procgen.sphere_mesh(64, 64, radius=10.0, displace_amp=0.3)
    sign = tp.closed_orientation(md.vertices, md.vtx_idx)
    assert sign != 0
    cm = pc.build_clustered(md.vertices[md.vtx_idx], nrm_sign=float(sign))
    assert cm.n_clusters <= pc.HIER_MIN_CLUSTERS
    org, dirn = _outside_and_escaping_rays(cm, 2048, rng)
    tmax = jnp.full((2048,), 1e6, jnp.float32)
    t0, tri0, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True,
                                      backface_cull=False)
    t1, tri1, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True,
                                      backface_cull=True)
    assert int((tri0 >= 0).sum()) > 500
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1))
    occ0 = pc.two_level_any(cm, org, dirn, tmax, interpret=True,
                            backface_cull=False)
    occ1 = pc.two_level_any(cm, org, dirn, tmax, interpret=True,
                            backface_cull=True)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))


def test_two_level_hit_backface_parity_hier():
    rng = np.random.default_rng(1)
    md = procgen.sphere_mesh(320, 320, radius=10.0, displace_amp=0.3)
    sign = tp.closed_orientation(md.vertices, md.vtx_idx)
    cm = pc.build_clustered(md.vertices[md.vtx_idx], nrm_sign=float(sign),
                            tris_c=512)
    assert cm.n_clusters > pc.HIER_MIN_CLUSTERS
    org, dirn = _outside_and_escaping_rays(cm, 1024, rng)
    tmax = jnp.full((1024,), 1e6, jnp.float32)
    t0, tri0, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True,
                                      backface_cull=False)
    t1, tri1, _, _ = pc.two_level_hit(cm, org, dirn, tmax, interpret=True,
                                      backface_cull=True)
    assert int((tri0 >= 0).sum()) > 300
    np.testing.assert_array_equal(np.asarray(tri0), np.asarray(tri1))
    np.testing.assert_allclose(np.asarray(t0), np.asarray(t1))


def test_upload_gating():
    md = procgen.sphere_mesh(48, 48, radius=6.0, displace_amp=0.2)
    assert mesh_mod.upload_mesh(md, obj_row=2,
                                use_cluster=True).backface_cull
    # open surface
    assert not mesh_mod.upload_mesh(procgen.terrain_mesh(48), obj_row=2,
                                    use_cluster=True).backface_cull
    # transparency / subsurface / explicit opt-out all gate off
    assert not mesh_mod.upload_mesh(md, obj_row=2, use_cluster=True,
                                    default_transp=True).backface_cull
    assert not mesh_mod.upload_mesh(md, obj_row=2, use_cluster=True,
                                    default_ksub=(0.5, 0, 0)).backface_cull
    assert not mesh_mod.upload_mesh(md, obj_row=2, use_cluster=True,
                                    allow_backface=False).backface_cull
    # alpha-cutout texture gates off
    alpha = np.zeros((4, 4, 3), np.float32)
    assert not mesh_mod.upload_mesh(
        md, obj_row=2, use_cluster=True,
        texture_overrides=[{'alpha': alpha}]).backface_cull


def _cluster_scene(md, translation=(0.0, -15.0, 0.0), extra=()):
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md, translation=translation))
    objs.extend(extra)
    sc = scn.build_scene(objs, scn.default_light_intensity())
    m = mesh_mod.upload_mesh(md, obj_row=sc.meshes[0].obj_row,
                             use_cluster=True)
    mesh = sc.meshes[0].replace(
        clustered=m.clustered, use_cluster=True,
        n_clusters=m.n_clusters,
        cluster_top_max_leaf=m.cluster_top_max_leaf,
        backface_cull=m.backface_cull)
    return sc.replace(meshes=(mesh,)), objs


def test_scene_gates():
    md = procgen.sphere_mesh(48, 48, radius=6.0, displace_amp=0.2)
    sc, objs = _cluster_scene(md)
    mesh = sc.meshes[0]
    assert mesh.backface_cull
    trans = np.stack([scn._build_matrices(o)[0] for o in objs])
    # default scene: keeps
    assert scn._gate_backface_overlap(mesh, objs, trans).backface_cull
    # a plain opaque object overlapping the mesh KEEPS the flag: its
    # surface inside the closed opaque mesh is unreachable (the gate's
    # reachability argument; test_e2e_render_identical covers it live)
    objs2 = objs + [pt.sphere((0.0, -15.0, 0.0), 2.0, kd=(1, 0, 0))]
    trans2 = np.stack([scn._build_matrices(o)[0] for o in objs2])
    assert scn._gate_backface_overlap(mesh, objs2, trans2).backface_cull
    # but an overlapping SUBSURFACE object clears it: its disk-probe
    # relocation can teleport a path to an exit point inside the mesh
    objs3 = objs + [pt.sphere((0.0, -15.0, 0.0), 2.0, ksub=(0.5, 0.2, 0.1))]
    trans3 = np.stack([scn._build_matrices(o)[0] for o in objs3])
    assert not scn._gate_backface_overlap(mesh, objs3,
                                          trans3).backface_cull
    # a DISTANT subsurface object keeps it
    objs4 = objs + [pt.sphere((0.0, 40.0, 0.0), 2.0, ksub=(0.5, 0.2, 0.1))]
    trans4 = np.stack([scn._build_matrices(o)[0] for o in objs4])
    assert scn._gate_backface_overlap(mesh, objs4, trans4).backface_cull
    # camera inside the mesh AABB clears; outside keeps
    assert not scn.camera_backface_gate(
        sc, np.asarray([0.0, -15.0, 0.0])).meshes[0].backface_cull
    assert scn.camera_backface_gate(
        sc, np.asarray([0.0, 0.0, 50.0])).meshes[0].backface_cull
    # ghost/flip specs never get the flag through build_scene
    objs3 = scn.default_objects()
    objs3.append(scn.mesh_object(md, translation=(0, -15, 0), ghost=True))
    sc3 = scn.build_scene(objs3, scn.default_light_intensity())
    assert not sc3.meshes[0].backface_cull


def test_e2e_render_identical():
    """Full tiny render through the Renderer: image with the cull ON
    equals the image with the cull OFF bit-for-bit (same RNG, same
    winners — the cull is exact, not approximate).

    The sphere here (radius 10 + displacement at y=-15) dips BELOW the
    floor plane (y=-27.3), so this doubles as the live check of the
    overlap gate's reachability argument: the floor region hidden
    inside the closed mesh is unreachable and the cull stays exact."""
    from pathtracer_tpu.render import renderer as rnd
    md = procgen.sphere_mesh(48, 48, radius=10.0, displace_amp=0.25)
    sc, _ = _cluster_scene(md)
    assert sc.meshes[0].backface_cull
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=24, height=16, nrays=2,
                           samples_per_wave=2, nb_bounces=3)
    img_on = np.asarray(pt.Renderer(sc, cam, cfg).render().display())
    sc_off = sc.replace(meshes=(sc.meshes[0].replace(backface_cull=False),))
    img_off = np.asarray(pt.Renderer(sc_off, cam, cfg).render().display())
    np.testing.assert_array_equal(img_on, img_off)
    assert img_on.mean() > 0.0


def test_inside_origin_queries_need_flag_off():
    """Rays ORIGINATING INSIDE a closed mesh see back faces — exactly
    what the cull (exact for outside origins only) removes.  Consumers
    that cast from inside (fluid.cells_inside_object's double-cast) must
    clear backface_cull; this documents the hazard at the kernel level
    and checks the fluid path stays correct on the cluster tier."""
    md = procgen.sphere_mesh(180, 180, radius=10.0, displace_amp=0.0)
    sign = tp.closed_orientation(md.vertices, md.vtx_idx)
    # small clusters -> narrow normal cones: the exit cluster of an
    # inside ray is all-back-facing and gets culled (a coarse mesh's
    # MIXED clusters would still surface the back-face hit — the cull
    # is cluster-granular)
    cm = pc.build_clustered(md.vertices[md.vtx_idx], nrm_sign=float(sign),
                            tris_c=256)
    rng = np.random.default_rng(5)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = jnp.zeros((16, 3), jnp.float32)         # center: inside
    dirn = jnp.asarray(d)
    tmax = jnp.full((16,), 1e6, jnp.float32)
    t_off, tri_off, _, _ = pc.two_level_hit(cm, org, dirn, tmax,
                                            interpret=True,
                                            backface_cull=False)
    t_on, tri_on, _, _ = pc.two_level_hit(cm, org, dirn, tmax,
                                          interpret=True,
                                          backface_cull=True)
    assert (np.asarray(tri_off) >= 0).all()       # back-face hits exist
    # the cull drops most of them (all-backface exit clusters)
    assert (np.asarray(tri_on) < 0).mean() > 0.5
    # the fluid inside-test clears the flag, so it stays correct even
    # when the shape mesh qualifies for culling
    from pathtracer_tpu.sim import fluid
    cfg = fluid.FluidConfig(lo=(-12, -12, -12), hi=(12, 12, 12),
                            nx=10, ny=10, nz=10)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md))
    inside, _ = fluid.cells_inside_object(cfg, objs, len(objs) - 1)
    centers = fluid._cell_centers(cfg)
    r = np.linalg.norm(centers, axis=-1)
    assert (inside == (r < 10.0)).mean() > 0.9
