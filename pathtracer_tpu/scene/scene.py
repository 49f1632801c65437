"""Scene as a pytree of SoA arrays + dense vectorized intersection.

TPU-native counterpart of the reference Scene/Object layer (reference:
Geometry.h:240-728 Object, :849-1103 Sphere, :1127-1217 Plane,
:1238-1400 + Geometry.cpp:589-744 Scene intersection dispatch).

Design: instead of a virtual-dispatch loop over heterogeneous objects, all
analytic objects live in one fixed-size SoA table; a ray intersects *every*
object in one fused vectorized sweep ((N rays) x (O objects) candidate-t
matrix, masked argmin).  O is small (analytic objects); triangle meshes are
handled separately by the BVH kernels (ops/).

Object slots follow the reference convention (Raytracer.cpp:1238-1274):
row 0 = spherical light, row 1 = environment dome (flipped-normal giant
sphere), row 2+ = user objects.

Transforms: every object carries 3x4 trans/inv_trans and 3x3 rot matrices
(reference: Geometry.h:322-396) built host-side per frame from keyframes;
rays are intersected in object space and hits mapped back, identically to
Scene::intersection (Geometry.cpp:589-688).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..core import vec

# object type tags
SPHERE = 0
PLANE = 1

BIG_T = jnp.float32(1e30)


class SceneArrays(NamedTuple):
    """Device-side scene: SoA over O analytic objects + global light/env."""

    obj_type: jnp.ndarray      # (O,) int32
    # sphere params (unused lanes are benign garbage for planes)
    center: jnp.ndarray        # (O,3) sphere center / plane point A
    radius: jnp.ndarray        # (O,) sphere radius
    normal: jnp.ndarray        # (O,3) plane normal (unit)
    flip_normals: jnp.ndarray  # (O,) bool
    # constant material channels (reference defaults Geometry.h:399-445)
    kd: jnp.ndarray            # (O,3)
    ks: jnp.ndarray            # (O,3)
    ne: jnp.ndarray            # (O,3) phong exponent per channel
    ksub: jnp.ndarray          # (O,3)
    transp: jnp.ndarray        # (O,) bool
    refr_index: jnp.ndarray    # (O,)
    miroir: jnp.ndarray        # (O,) bool
    ghost: jnp.ndarray         # (O,) bool
    # transforms (reference: Geometry.h:322-396)
    trans: jnp.ndarray         # (O,3,4)
    inv_trans: jnp.ndarray     # (O,3,4)
    rot: jnp.ndarray           # (O,3,3)
    # light / environment
    light_intensity: jnp.ndarray   # scalar: s.intensite_lumiere
    light_scale: jnp.ndarray       # scalar: light keyframe scale
    envmap_intensity: jnp.ndarray  # scalar
    envmap: Optional[jnp.ndarray]  # (He,We,3) f32 dome radiance texture or None
    # cached light constants (prepare_render, Raytracer.cpp:1377-1380)
    center_light: jnp.ndarray      # (3,)
    radius_light: jnp.ndarray      # scalar

    @property
    def num_objects(self):
        return self.obj_type.shape[0]

    @property
    def light_power(self):
        """lightPower = intensite_lumiere / scale^2 (Raytracer.cpp:1380)."""
        return self.light_intensity / (self.light_scale * self.light_scale)


class Hit(NamedTuple):
    """Per-ray hit record (the reference's (P, sphere_id, t, mat) out-params)."""

    hit: jnp.ndarray        # (N,) bool
    t: jnp.ndarray          # (N,)
    p: jnp.ndarray          # (N,3) world-space point
    n: jnp.ndarray          # (N,3) unit shading normal
    obj_id: jnp.ndarray     # (N,) int32
    kd: jnp.ndarray         # (N,3)
    ks: jnp.ndarray         # (N,3)
    ne: jnp.ndarray         # (N,3)
    ke: jnp.ndarray         # (N,3)
    ksub: jnp.ndarray       # (N,3)
    transp: jnp.ndarray     # (N,) bool
    refr_index: jnp.ndarray  # (N,)
    miroir: jnp.ndarray     # (N,) bool
    ghost: jnp.ndarray      # (N,) bool


def _apply_affine(m, v):
    """(N,3) points through (O,3,4) affines: returns (N, O, 3).

    Explicit elementwise form, NOT einsum: a 3-wide contraction belongs on the
    VPU, and TPU matmul default precision truncates f32 to bf16 passes — the
    resulting ~1e-3 coordinate error amplifies through the sphere quadric
    cancellation and flips visibility branches vs the exact CPU reference.
    """
    v = v[:, None, :]                                   # (N,1,3)
    out = (m[None, :, :, 0] * v[..., 0:1]
           + m[None, :, :, 1] * v[..., 1:2]
           + m[None, :, :, 2] * v[..., 2:3]
           + m[None, :, :, 3])
    return out                                          # (N,O,3)


def _apply_linear(m3, v):
    """(N,3) vectors through (O,3,3) linear maps: returns (N, O, 3)."""
    v = v[:, None, :]
    return (m3[None, :, :, 0] * v[..., 0:1]
            + m3[None, :, :, 1] * v[..., 1:2]
            + m3[None, :, :, 2] * v[..., 2:3])


def _apply_rows(m, v):
    """(N,3) vectors through per-lane (N,3,3+) matrices -> (N,3)."""
    return (m[:, :, 0] * v[:, 0:1] + m[:, :, 1] * v[:, 1:2]
            + m[:, :, 2] * v[:, 2:3])


def _sphere_candidates(sc: SceneArrays, org, dirn):
    """Quadric hit per (ray, object) in object space.

    reference: Geometry.h:918-992 — returns smallest positive root, or the
    far root if inside; direction may be non-unit under object scaling.
    """
    oc = org - sc.center                                  # (N,O,3)
    b = jnp.sum(dirn * oc, axis=-1)                       # (N,O)
    a = jnp.sum(dirn * dirn, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - sc.radius * sc.radius
    delta = b * b - a * c
    ok = delta >= 0.0
    sq = jnp.sqrt(jnp.maximum(delta, 0.0))
    inva = 1.0 / a
    t2 = (-b + sq) * inva
    t1 = (-b - sq) * inva
    t = jnp.where(t1 > 0.0, t1, t2)
    ok = ok & (t2 >= 0.0) & (t > 0.0)
    return jnp.where(ok, t, BIG_T)


def _plane_candidates(sc: SceneArrays, org, dirn):
    """Plane hit per (ray, object) in object space (reference: Geometry.h:1142-1157)."""
    ddot = jnp.sum(dirn * sc.normal, axis=-1)             # (N,O)
    safe = jnp.abs(ddot) >= 1e-9
    t = jnp.sum((sc.center - org) * sc.normal, axis=-1) / jnp.where(safe, ddot, 1.0)
    ok = safe & (t > 0.0)
    return jnp.where(ok, t, BIG_T)


def _candidate_ts(sc: SceneArrays, origins, dirs, avoid_ghosts=False,
                  skip_obj_id=None):
    """All candidate hit distances: (N, O) with BIG_T for misses.

    Rays are mapped to each object's space first (Geometry.cpp:606-608):
    org' = inv_trans @ (org, 1);  dir' = inv_trans[:,:3] @ dir.
    """
    org_l = _apply_affine(sc.inv_trans, origins)          # (N,O,3)
    dir_l = _apply_linear(sc.inv_trans[..., :3], dirs)

    t_sph = _sphere_candidates(sc, org_l, dir_l)
    t_pl = _plane_candidates(sc, org_l, dir_l)
    t = jnp.where(sc.obj_type == SPHERE, t_sph, t_pl)     # (N,O)
    if avoid_ghosts:
        t = jnp.where(sc.ghost, BIG_T, t)
    if skip_obj_id is not None:
        oid = jnp.arange(sc.num_objects, dtype=jnp.int32)
        t = jnp.where(oid[None, :] == skip_obj_id[:, None], BIG_T, t)
    return t, org_l, dir_l


def _envmap_ke(sc: SceneArrays, n_unit):
    """Dome radiance lookup (reference: Geometry.h:963-977).

    theta = 1 - acos(N.y)/pi; phi = (atan2(-N.z, N.x) + pi) / 2pi;
    Ke = tex[theta*(H-1), phi*(W-1)] * 100000/255.
    """
    if sc.envmap is None:
        return jnp.zeros_like(n_unit)
    eh, ew = sc.envmap.shape[0], sc.envmap.shape[1]
    theta = 1.0 - jnp.arccos(jnp.clip(n_unit[..., 1], -1.0, 1.0)) / np.pi
    phi = (jnp.arctan2(-n_unit[..., 2], n_unit[..., 0]) + np.pi) / (2.0 * np.pi)
    ti = jnp.clip((theta * (eh - 1)).astype(jnp.int32), 0, eh - 1)
    pi_ = jnp.clip((phi * (ew - 1)).astype(jnp.int32), 0, ew - 1)
    return sc.envmap[ti, pi_] * jnp.float32(100000.0 / 255.0)


def intersect(sc: SceneArrays, origins, dirs, avoid_ghosts=False) -> Hit:
    """Closest-hit over all analytic objects (Geometry.cpp:589-688).

    origins/dirs: (N,3).  Fully vectorized: one (N,O) candidate matrix,
    masked argmin, then per-hit gathers — no per-object control flow.
    """
    t_all, org_l, dir_l = _candidate_ts(sc, origins, dirs, avoid_ghosts)
    obj_id = jnp.argmin(t_all, axis=-1).astype(jnp.int32)     # (N,)
    t = jnp.take_along_axis(t_all, obj_id[:, None], axis=-1)[:, 0]
    hit = t < BIG_T

    rows = obj_id
    # object-space hit point and normal
    p_l = (jnp.take_along_axis(org_l, rows[:, None, None], axis=1)[:, 0]
           + t[:, None] * jnp.take_along_axis(dir_l, rows[:, None, None], axis=1)[:, 0])
    is_sphere = sc.obj_type[rows] == SPHERE
    n_sphere = p_l - sc.center[rows]
    n_plane = sc.normal[rows]
    n_l = jnp.where(is_sphere[:, None], n_sphere, n_plane)
    n_l = jnp.where(sc.flip_normals[rows, None], -n_l, n_l)

    # back to world space (Geometry.cpp:677-684)
    tr = sc.trans[rows]                                       # (N,3,4)
    p = _apply_rows(tr, p_l) + tr[..., 3]
    n = vec.normalize(_apply_rows(sc.rot[rows], n_l))

    # dome radiance: only object 1 carries the envmap (Raytracer.cpp:1258)
    n_sph_unit = vec.normalize(n_sphere)
    ke = jnp.where((rows == 1)[:, None], _envmap_ke(sc, n_sph_unit),
                   jnp.zeros_like(p))

    return Hit(
        hit=hit, t=t, p=p, n=n, obj_id=obj_id,
        kd=sc.kd[rows], ks=sc.ks[rows], ne=sc.ne[rows], ke=ke,
        ksub=sc.ksub[rows], transp=sc.transp[rows] & hit,
        refr_index=sc.refr_index[rows],
        miroir=sc.miroir[rows] & hit, ghost=sc.ghost[rows] & hit,
    )


def intersect_shadow(sc: SceneArrays, origins, dirs, dist_light,
                     avoid_ghosts=True):
    """Any-hit within 0.999*dist_light (Geometry.cpp:691-744). Returns bool (N,)."""
    t_all, _, _ = _candidate_ts(sc, origins, dirs, avoid_ghosts)
    blocked = jnp.any(t_all < (dist_light[:, None] * 0.999), axis=-1)
    return blocked


# ---------------------------------------------------------------------------
# Host-side scene building
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ObjectSpec:
    """Host-side description of one analytic object (builder input)."""

    obj_type: int
    center: Any = (0.0, 0.0, 0.0)   # sphere center or plane point
    radius: float = 1.0
    normal: Any = (0.0, 1.0, 0.0)
    flip_normals: bool = False
    kd: Any = (1.0, 1.0, 1.0)       # queryMaterial defaults (Geometry.h:404-441)
    ks: Any = (0.0, 0.0, 0.0)
    ne: Any = (1.0, 1.0, 1.0)
    ksub: Any = (0.0, 0.0, 0.0)
    transp: bool = False
    refr_index: float = 1.3
    miroir: bool = False
    ghost: bool = False
    translation: Any = (0.0, 0.0, 0.0)
    rotation: Any = None            # 3x3 or None
    scale: float = 1.0
    rotation_center: Any = None     # defaults to sphere center / (0,0,0)


def sphere(center, radius, **kw) -> ObjectSpec:
    spec = ObjectSpec(obj_type=SPHERE, center=center, radius=radius, **kw)
    if spec.rotation_center is None:
        spec.rotation_center = center
    return spec


def plane(point, normal, **kw) -> ObjectSpec:
    spec = ObjectSpec(obj_type=PLANE, center=point, normal=normal, **kw)
    if spec.rotation_center is None:
        spec.rotation_center = (0.0, 0.0, 0.0)
    return spec


def _build_matrices(spec: ObjectSpec):
    """Compose 3x4 trans/inv and 3x3 rot (reference: Geometry.h:322-360)."""
    m = np.eye(3) if spec.rotation is None else np.asarray(spec.rotation, np.float64)
    s = float(spec.scale)
    tr = np.asarray(spec.translation, np.float64)
    rc = np.asarray(spec.rotation_center, np.float64)
    trans = np.zeros((3, 4))
    inv = np.zeros((3, 4))
    trans[:, :3] = m * s
    inv[:, :3] = m.T / s
    trans[:, 3] = m @ (-rc) * s + rc + tr
    inv[:, 3] = m.T @ (-rc - tr) / s + rc
    return trans.astype(np.float32), inv.astype(np.float32), m.astype(np.float32)


def build_scene(objects, light_intensity, envmap_intensity=1.0, envmap=None,
                light_scale=1.0) -> SceneArrays:
    """Assemble SceneArrays from ObjectSpecs. objects[0]=light, [1]=dome."""
    n = len(objects)
    assert n >= 2, "scene needs at least light (0) and dome (1) objects"

    def stack(field, dim3=False):
        vals = [getattr(o, field) for o in objects]
        if dim3:
            return np.asarray([np.broadcast_to(np.asarray(v, np.float32), (3,))
                               for v in vals], np.float32)
        return np.asarray(vals, np.float32)

    mats = [_build_matrices(o) for o in objects]
    trans = np.stack([m[0] for m in mats])
    inv_trans = np.stack([m[1] for m in mats])
    rot = np.stack([m[2] for m in mats])

    light = objects[0]
    light_tr = trans[0]
    center_light = (light_tr[:, :3] @ np.asarray(light.center, np.float32)
                    + light_tr[:, 3])

    return SceneArrays(
        obj_type=jnp.asarray([o.obj_type for o in objects], jnp.int32),
        center=jnp.asarray(stack('center', dim3=True)),
        radius=jnp.asarray([float(o.radius) for o in objects], jnp.float32),
        normal=jnp.asarray(stack('normal', dim3=True)),
        flip_normals=jnp.asarray([o.flip_normals for o in objects], bool),
        kd=jnp.asarray(stack('kd', dim3=True)),
        ks=jnp.asarray(stack('ks', dim3=True)),
        ne=jnp.asarray(stack('ne', dim3=True)),
        ksub=jnp.asarray(stack('ksub', dim3=True)),
        transp=jnp.asarray([o.transp for o in objects], bool),
        refr_index=jnp.asarray([float(o.refr_index) for o in objects], jnp.float32),
        miroir=jnp.asarray([o.miroir for o in objects], bool),
        ghost=jnp.asarray([o.ghost for o in objects], bool),
        trans=jnp.asarray(trans),
        inv_trans=jnp.asarray(inv_trans),
        rot=jnp.asarray(rot),
        light_intensity=jnp.float32(light_intensity),
        light_scale=jnp.float32(light_scale * objects[0].scale),
        envmap_intensity=jnp.float32(envmap_intensity),
        envmap=None if envmap is None else jnp.asarray(envmap, jnp.float32),
        center_light=jnp.asarray(center_light, jnp.float32),
        radius_light=jnp.float32(light.radius * light_scale * objects[0].scale),
    )


def default_objects():
    """The reference default scene's object slate (Raytracer.cpp:1238-1274):
    light sphere at (10,23,15) r=10, flipped env dome r=1e6, ground plane
    translated to y=-27.3.  Append user objects after these three."""
    return [
        sphere((10.0, 23.0, 15.0), 10.0),
        sphere((0.0, 0.0, 0.0), 1e6, flip_normals=True),
        plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), translation=(0.0, -27.3, 0.0)),
    ]


def default_light_intensity(r_lum=10.0):
    """intensite_lumiere = 1e9*4pi/(4pi*R^2*pi) (Raytracer.cpp:1270)."""
    return 1e9 / (r_lum * r_lum * np.pi)
