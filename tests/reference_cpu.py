"""Sequential per-path CPU reference tracer (numpy/python, float32).

This mirrors the *reference C++ algorithm* (nbonneel/pathtracer
Raytracer.cpp:196-664 getColor, Vector.h:792-825 generateDirection) path by
path, drawing randomness from the same keyed PCG32 streams as the TPU
wavefront renderer.  It is the ground truth for the BASELINE north-star
"forward image must match the reference CPU render (allclose at equal sample
sequences)": the thread-scheduling-dependent engine assignment of the C++
is replaced by the documented per-path keying on both sides (SURVEY §7).

Scope: analytic scene (spheres + planes), Phong/Lambert materials, mirror,
Fresnel transparency, NEE to the spherical light, envmap dome. No fog/SS yet.
"""

from __future__ import annotations

import math

import numpy as np

from pathtracer_tpu.core.rng_host import PCG32
from pathtracer_tpu.core.qmc import extensible_lattice_2d_np

F = np.float32


def normalize(v):
    return v / np.linalg.norm(v)


def get_tangent(n):
    an = np.abs(n)
    if an[0] <= an[1] and an[0] <= an[2]:
        t = np.array([0.0, -n[2], n[1]], np.float32)
    elif an[1] <= an[0] and an[1] <= an[2]:
        t = np.array([-n[2], 0.0, n[0]], np.float32)
    else:
        t = np.array([-n[1], n[0], 0.0], np.float32)
    return normalize(t)


def random_cos(n, r1, r2):
    sr2 = math.sqrt(max(0.0, 1.0 - r2))
    lx = math.cos(2.0 * math.pi * r1) * sr2
    ly = math.sin(2.0 * math.pi * r1) * sr2
    lz = math.sqrt(max(0.0, r2))
    t1 = get_tangent(n)
    t2 = np.cross(t1, n)
    return lz * n + lx * t1 + ly * t2


def random_phong(r_dir, e, r1, r2):
    z = r2 ** (1.0 / (e + 1.0))
    fac = math.sqrt(max(0.0, 1.0 - z * z))
    lx = math.cos(2.0 * math.pi * r1) * fac
    ly = math.sin(2.0 * math.pi * r1) * fac
    t1 = get_tangent(r_dir)
    t2 = np.cross(t1, r_dir)
    return z * r_dir + lx * t1 + ly * t2


def reflect(d, n):
    return d - 2.0 * np.dot(d, n) * n


def phong_eval(kd, ks, ne, wi, wo, n):
    refl = reflect(-wo, n)
    d = np.dot(refl, wi)
    if d < 0:
        return kd / np.pi
    lobe = (d ** ne) * (ne + 2.0) / (2.0 * np.pi)
    return kd / np.pi + lobe * ks


class Obj:
    def __init__(self, kind, center=None, radius=None, point=None, normal=None,
                 flip_normals=False, kd=(1, 1, 1), ks=(0, 0, 0), ne=(1, 1, 1),
                 transp=False, refr_index=1.3, miroir=False,
                 translation=(0, 0, 0), tri_verts=None, tri_normals=None):
        self.kind = kind
        self.center = (np.asarray(center if center is not None else point,
                                  np.float32)
                       if (center is not None or point is not None) else None)
        self.radius = radius
        self.normal = None if normal is None else np.asarray(normal, np.float32)
        self.flip_normals = flip_normals
        self.kd = np.asarray(kd, np.float32)
        self.ks = np.asarray(ks, np.float32)
        self.ne = np.asarray(ne, np.float32)
        self.transp = transp
        self.refr_index = refr_index
        self.miroir = miroir
        self.translation = np.asarray(translation, np.float32)
        self.tri_verts = tri_verts        # (T,3,3) for kind == 'mesh'
        self.tri_normals = tri_normals    # (T,3,3) per-corner shading normals

    def intersect(self, org, dirn):
        """Returns (t, normal_localframe) or None.  Translation-only
        transforms: intersect in object space org - translation."""
        o = org - self.translation
        if self.kind == 'sphere':
            oc = o - self.center
            b = np.dot(dirn, oc)
            a = np.dot(dirn, dirn)
            c = np.dot(oc, oc) - self.radius * self.radius
            delta = b * b - a * c
            if delta < 0:
                return None
            sq = math.sqrt(delta)
            t2 = (-b + sq) / a
            if t2 < 0:
                return None
            t1 = (-b - sq) / a
            t = t1 if t1 > 0 else t2
            p = o + t * dirn
            n = p - self.center
            if self.flip_normals:
                n = -n
            return t, n
        elif self.kind == 'plane':
            ddot = np.dot(dirn, self.normal)
            if abs(ddot) < 1e-9:
                return None
            t = np.dot(self.center - o, self.normal) / ddot
            if t <= 0:
                return None
            n = self.normal
            if self.flip_normals:
                n = -n
            return t, n
        else:  # mesh: brute force over triangles, edge-matrix test
            best_t, best_n = np.inf, None
            for k in range(len(self.tri_verts)):
                a3, b3, c3 = self.tri_verts[k]
                u = b3 - a3
                v = c3 - a3
                nrm = np.cross(u, v)
                dn = np.dot(dirn, nrm)
                t = np.dot(a3 - o, nrm) / dn
                if not (t >= 0) or np.isnan(t):
                    continue
                p = o + t * dirn
                w = p - a3
                m11 = np.dot(u, u); m22 = np.dot(v, v); m12 = np.dot(u, v)
                invdet = 1.0 / (m11 * m22 - m12 * m12)
                b11 = np.dot(w, u); b21 = np.dot(w, v)
                beta = (b11 * m22 - b21 * m12) * invdet
                if beta < 0:
                    continue
                gamma = (b21 * m11 - b11 * m12) * invdet
                if gamma < 0:
                    continue
                alpha = 1 - beta - gamma
                if alpha < 0:
                    continue
                if t < best_t:
                    best_t = t
                    if self.tri_normals is not None:
                        sn = (self.tri_normals[k, 0] * alpha
                              + self.tri_normals[k, 1] * beta
                              + self.tri_normals[k, 2] * gamma)
                    else:
                        sn = nrm
                    best_n = -sn if self.flip_normals else sn
            if best_n is None:
                return None
            return best_t, best_n


class CPUScene:
    def __init__(self, objects, light_intensity, envmap_intensity=1.0):
        self.objects = objects
        self.light_intensity = light_intensity
        self.envmap_intensity = envmap_intensity
        light = objects[0]
        self.center_light = light.center + light.translation
        self.radius_light = light.radius
        self.light_power = light_intensity  # scale == 1

    def intersection(self, org, dirn):
        best_t, best_i, best_n = np.inf, -1, None
        for i, obj in enumerate(self.objects):
            res = obj.intersect(org, dirn)
            if res is not None and res[0] < best_t:
                best_t, best_i, best_n = res[0], i, res[1]
        if best_i < 0:
            return None
        return best_t, best_i, normalize(best_n)

    def intersection_shadow(self, org, dirn, dist_light):
        for obj in self.objects:
            res = obj.intersect(org, dirn)
            if res is not None and res[0] < dist_light * 0.999:
                return True
        return False


def generate_ray(cam, i, j, dx, dy, dxa, dya, W, H):
    """Mirror of Camera::generateDirection (Vector.h:792-825), float math."""
    pos, direction, up, fov, focus = (cam['position'], cam['direction'],
                                      cam['up'], cam['fov'], cam['focus'])
    k = W / (2.0 * math.tan(fov / 2.0))
    right = np.cross(direction, up)
    d = np.array([j - W / 2.0 + 0.5 + dx, i - H / 2.0 + 0.5 + dy, k],
                 np.float32)
    d = normalize(d)
    world = right * d[0] + up * d[1] + direction * d[2]
    dest = pos + focus / abs(np.dot(world, direction)) * world
    new_org = pos + dxa * right + dya * up
    new_dir = normalize(dest - new_org)
    return new_org, new_dir


def trace_path(scene: CPUScene, cam, i, j, key, cp_shift, lattice_pt,
               nb_bounces, W, H):
    """One full path with the canonical draw order (see integrator.py)."""
    eng = PCG32(key, key)
    dx = eng.next_float() - 0.5
    dy = eng.next_float() - 0.5
    dxa = (eng.next_float() - 0.5) * cam['aperture']
    dya = (eng.next_float() - 0.5) * cam['aperture']
    org, dirn = generate_ray(cam, i, j, dx, dy, dxa, dya, W, H)

    r1_cp = (cp_shift[0] + lattice_pt[0]) % 1.0
    r2_cp = (cp_shift[1] + lattice_pt[1]) % 1.0

    color = np.zeros(3, np.float32)
    weight = np.ones(3, np.float32)
    show_lights = True
    show_env = True

    for _depth in range(nb_bounces):
        if np.dot(weight, weight) < 1e-4:
            break
        res = scene.intersection(org, dirn)
        if res is None:
            break
        t, oid, n = res
        p = org + t * dirn
        obj = scene.objects[oid]
        if oid == 1:
            # dome: Ke is 0 without an envmap texture
            break
        if oid == 0:
            if show_lights:
                color += weight * scene.light_power
            break

        if obj.miroir:
            dirn = reflect(dirn, n)
            org = p + 0.001 * n
            continue

        if obj.transp:
            cos_in = np.dot(dirn, n)
            if cos_in > 0:
                n1, n2, n_t = obj.refr_index, 1.0, -n
            else:
                n1, n2, n_t = 1.0, obj.refr_index, n
            eta = n1 / n2
            cos_t = np.dot(n_t, dirn)
            radical = 1.0 - eta * eta * (1.0 - cos_t * cos_t)
            u = eng.next_float()
            if radical > 0:
                refr = eta * (dirn - cos_t * n_t) - n_t * math.sqrt(radical)
                r0 = ((n1 - n2) / (n1 + n2)) ** 2
                if cos_in > 0:
                    fres = r0 + (1 - r0) * max(0.0, 1.0 - np.dot(refr, n)) ** 5
                else:
                    fres = r0 + (1 - r0) * max(0.0, 1.0 + cos_in) ** 5
                if u < fres:
                    org, dirn = p + 0.001 * n_t, reflect(dirn, n)
                else:
                    org, dirn = p - 0.001 * n_t, refr
            else:
                org, dirn = p + 0.001 * n_t, reflect(dirn, n)
            continue

        # --- diffuse surface: NEE + indirect ---
        r1 = eng.next_float()
        r2 = eng.next_float()
        axe_op = normalize(p - scene.center_light)
        dir_al = random_cos(axe_op, r1, r2)
        point_al = dir_al * scene.radius_light + scene.center_light
        to_l = point_al - p
        d2 = np.dot(to_l, to_l)
        wi = normalize(to_l)
        cos_surf = np.dot(n, wi)
        if cos_surf < 0:
            shadowed = True
        else:
            shadowed = scene.intersection_shadow(p + 0.01 * wi, wi,
                                                 math.sqrt(d2) - 0.01)
        if not shadowed:
            f = phong_eval(obj.kd, obj.ks, obj.ne, wi, -dirn, n)
            jac = np.dot(dir_al, -wi) / d2
            proba = np.dot(axe_op, dir_al) / (np.pi * scene.radius_light ** 2)
            if proba > 0:
                color += weight * (scene.light_power * max(0.0, cos_surf)
                                   * jac / proba) * f

        # indirect: engine lobe choice + CP lattice 2D point
        u_choice = eng.next_float()
        avg_ne = float(np.mean(obj.ne))
        pdiff = 1.0 - float(np.mean(obj.ks))
        r_mirror = reflect(dirn, n)
        if u_choice < pdiff:
            d_ind = random_cos(n, r1_cp, r2_cp)
        else:
            d_ind = random_phong(r_mirror, avg_ne, r1_cp, r2_cp)
        proba_phong = ((avg_ne + 1.0) / (2.0 * np.pi)
                       * max(0.0, np.dot(r_mirror, d_ind)) ** avg_ne)
        pdf = (pdiff * np.dot(n, d_ind) / np.pi
               + (1.0 - pdiff) * proba_phong)
        if (np.dot(d_ind, n) < 0 or np.dot(d_ind, r_mirror) < 0 or pdf <= 0):
            break
        f_ind = phong_eval(obj.kd, obj.ks, obj.ne, d_ind, -dirn, n)
        weight = weight * f_ind * (np.dot(n, d_ind) / pdf)
        org = p + 0.01 * d_ind
        dirn = d_ind
        show_lights = False

    return color, dx, dy


def render_cpu(scene, cam, W, H, nspp, nb_bounces, cp_table, seed=0):
    """Per-sample radiance records, (H, W, nspp, 3); mean over axis 2 = image."""
    out = np.zeros((H, W, nspp, 3), np.float32)
    for i in range(H):
        for j in range(W):
            pix = i * W + j
            for k in range(nspp):
                key = (seed << 32) | (pix * nspp + k)
                lat = extensible_lattice_2d_np(np.uint32(k))
                c, _, _ = trace_path(scene, cam, i, j, key, cp_table[pix],
                                     lat, nb_bounces, W, H)
                out[i, j, k] = c
    return out
