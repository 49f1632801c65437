"""Point sets: XYZ import, kNN normal/radius estimation, disk splats.

TPU-native counterpart of PointSet (reference: PointSet.h:38-239,
PointSet.cpp:124-244): points render as normal-oriented disks; normals are
estimated by 10-NN PCA when absent (nanoflann + CImg symmetric_eigen in
the reference -> scipy cKDTree + numpy eigh here); splat radius is
0.21*2*d6 (distance to the 6th neighbor, PointSet.h:176).

Disk intersection runs as a chunked dense sweep over points (N rays x
P-point blocks) — the disk test is 10 flops, pure VPU work.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.struct

BIG_T = np.float32(1e30)

# column codes (reference: PointSet.h:53 comment)
COL_IGNORE, COL_X, COL_Y, COL_Z = -1, 0, 1, 2
COL_NX, COL_NY, COL_NZ = 3, 4, 5
COL_R, COL_G, COL_B = 6, 7, 8


def load_xyz(path: str, cols, centered: bool = True):
    """Parse an XYZ file with user column mapping (reference:
    PointSet.h:52-99 + format dialog mainApp.cpp:2379-2400).

    Returns (points (P,3), normals (P,3) or zeros, colors (P,3)).
    Colors default to (1,1,1)/255 exactly like the reference (quirk: a
    colorless point set is nearly black, PointSet.h:61+96).
    """
    data = np.loadtxt(path, ndmin=2).astype(np.float32)
    ncols = data.shape[1]
    assert len(cols) <= ncols, f"mapping has {len(cols)} cols, file {ncols}"
    p = np.zeros((len(data), 3), np.float32)
    n = np.zeros((len(data), 3), np.float32)
    c = np.full((len(data), 3), 1.0, np.float32)
    for i, code in enumerate(cols):
        if code == COL_IGNORE:
            continue
        if code <= COL_Z:
            p[:, code] = data[:, i]
        elif code <= COL_NZ:
            n[:, code - 3] = data[:, i]
        else:
            c[:, code - 6] = data[:, i]
    c = c / 255.0
    if centered and len(p):
        lo, hi = p.min(0), p.max(0)
        s = float(max(hi - lo))
        p = (p - (lo + hi) * 0.5) / s
    return p, n, c


def estimate_normals(points: np.ndarray, k: int = 10):
    """10-NN PCA normals + 0.42*d6 radii (reference: PointSet.h:125-179)."""
    from scipy.spatial import cKDTree
    tree = cKDTree(points)
    dist, idx = tree.query(points, k=k)
    neigh = points[idx]                        # (P,k,3)
    center = neigh.mean(axis=1, keepdims=True)
    d = neigh - center
    cov = np.einsum('pki,pkj->pij', d, d)
    _w, v = np.linalg.eigh(cov)                # ascending eigenvalues
    normals = v[:, :, 0].astype(np.float32)    # smallest -> surface normal
    radii = (0.21 * 2.0 * np.maximum(1e-8, dist[:, 5])).astype(np.float32)
    return normals, radii


@flax.struct.dataclass
class PointSetArrays:
    """Device-side point set bound to an object-table row."""

    px: jnp.ndarray; py: jnp.ndarray; pz: jnp.ndarray       # (P,)
    nx: jnp.ndarray; ny: jnp.ndarray; nz: jnp.ndarray       # unit normals
    radius: jnp.ndarray                                     # (P,)
    colors: jnp.ndarray                                     # (P,3)
    obj_row: int = flax.struct.field(pytree_node=False)
    display_edges: bool = flax.struct.field(pytree_node=False, default=False)
    # True: points are SPHERES (fluid particle rendering, fluid.cpp:175-262)
    # False: normal-oriented disks (PointSet splats)
    as_spheres: bool = flax.struct.field(pytree_node=False, default=False)
    # transparent fluid: union-exit semantics for interior rays
    transparent: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def num_points(self):
        return self.px.shape[0]


def upload_pointset(points, normals, colors, radii, obj_row,
                    display_edges=False) -> PointSetArrays:
    n = normals / np.maximum(
        np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    return PointSetArrays(
        px=jnp.asarray(points[:, 0]), py=jnp.asarray(points[:, 1]),
        pz=jnp.asarray(points[:, 2]),
        nx=jnp.asarray(n[:, 0]), ny=jnp.asarray(n[:, 1]),
        nz=jnp.asarray(n[:, 2]),
        radius=jnp.asarray(radii), colors=jnp.asarray(colors),
        obj_row=int(obj_row), display_edges=bool(display_edges),
    )


def make_pointset(path_or_points, cols=None, obj_row=0, normals=None,
                  colors=None, centered=True,
                  display_edges=False) -> PointSetArrays:
    """Load + estimate + upload in one step (PointSet::init)."""
    if isinstance(path_or_points, str):
        pts, nrm, col = load_xyz(path_or_points, cols or [0, 1, 2], centered)
    else:
        pts = np.asarray(path_or_points, np.float32)
        nrm = np.zeros_like(pts) if normals is None else np.asarray(normals)
        col = (np.full((len(pts), 3), 1 / 255, np.float32) if colors is None
               else np.asarray(colors, np.float32))
    if not nrm.any():
        nrm, radii = estimate_normals(pts)
    else:
        _, radii = estimate_normals(pts)   # radii still from kNN spacing
    return upload_pointset(pts, nrm, col, radii, obj_row, display_edges)


def sphere_sweep(ps: PointSetArrays, org, dirn, t_max, chunk: int = 4096):
    """Closest sphere hit over all points (fluid opaque mode: nearest
    particle sphere, reference fluid.cpp:175-262). Returns (t, index)."""
    n = org.shape[0]
    ox, oy, oz = org[:, 0:1], org[:, 1:2], org[:, 2:3]
    dx, dy, dz = dirn[:, 0:1], dirn[:, 1:2], dirn[:, 2:3]
    a = (dx * dx + dy * dy + dz * dz)
    best_t = t_max
    best_i = jnp.full((n,), -1, jnp.int32)
    total = ps.num_points
    for start in range(0, total, chunk):
        sl = slice(start, min(start + chunk, total))
        ocx = ox - ps.px[sl]
        ocy = oy - ps.py[sl]
        ocz = oz - ps.pz[sl]
        b = dx * ocx + dy * ocy + dz * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - ps.radius[sl] ** 2
        delta = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1 = (-b - sq) / a
        t2 = (-b + sq) / a
        t = jnp.where(t1 > 0, t1, t2)
        ok = (delta >= 0) & (t2 >= 0) & (t > 0)
        t = jnp.where(ok, t, BIG_T)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
        win = tj < best_t
        best_i = jnp.where(win, j.astype(jnp.int32) + start, best_i)
        best_t = jnp.where(win, tj, best_t)
    return best_t, best_i


def sphere_union_exit(ps: PointSetArrays, org, dirn, chunk: int = 4096,
                      iters: int = 6):
    """Exit point of the union of spheres containing the ray origin.

    TPU-native form of the reference's transparent-fluid interval walk
    (fluid.cpp:65-171: collect per-sphere (t1,t2), sort, walk merged
    intervals): instead of a per-lane sort, iterate a monotone fixed point —
    extend the current exit t by any sphere whose interval straddles it.
    Converges to the union-component exit in a few sweeps.

    Returns (t_exit (N,), idx (N,) of the sphere providing the exit,
    inside (N,) bool).
    """
    n = org.shape[0]
    ox, oy, oz = org[:, 0:1], org[:, 1:2], org[:, 2:3]
    dx, dy, dz = dirn[:, 0:1], dirn[:, 1:2], dirn[:, 2:3]
    a = dx * dx + dy * dy + dz * dz
    total = ps.num_points

    t_exit = jnp.zeros((n,))
    idx = jnp.full((n,), -1, jnp.int32)
    inside = jnp.zeros((n,), bool)
    eps = 1e-4
    for it in range(iters):
        changed_exit = t_exit
        changed_idx = idx
        for start in range(0, total, chunk):
            sl = slice(start, min(start + chunk, total))
            ocx = ox - ps.px[sl]
            ocy = oy - ps.py[sl]
            ocz = oz - ps.pz[sl]
            b = dx * ocx + dy * ocy + dz * ocz
            c = ocx * ocx + ocy * ocy + ocz * ocz - ps.radius[sl] ** 2
            delta = b * b - a * c
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            t1 = (-b - sq) / a
            t2 = (-b + sq) / a
            ok = (delta >= 0) & (t2 > 0)
            if it == 0:
                inside = inside | jnp.any(ok & (t1 < 0), axis=-1)
            # spheres whose interval straddles the current exit extend it
            straddle = ok & (t1 <= (changed_exit[:, None] + eps)) \
                & (t2 > changed_exit[:, None])
            t2m = jnp.where(straddle, t2, -1.0)
            j = jnp.argmax(t2m, axis=-1)
            tj = jnp.take_along_axis(t2m, j[:, None], -1)[:, 0]
            win = tj > changed_exit
            changed_idx = jnp.where(win, j.astype(jnp.int32) + start,
                                    changed_idx)
            changed_exit = jnp.where(win, tj, changed_exit)
        t_exit = changed_exit
        idx = changed_idx
    return t_exit, idx, inside


def fluid_pointset(particles, obj_row=0, radius=0.5,
                   color=(0.4, 0.6, 0.9)) -> PointSetArrays:
    """Fluid-frame particles as a renderable sphere set (the reference
    displays Fluid via its particle spheres, fluid.cpp:628-635)."""
    p = np.asarray(particles, np.float32)
    n = len(p)
    col = np.broadcast_to(np.asarray(color, np.float32), (n, 3)).copy()
    return PointSetArrays(
        px=jnp.asarray(p[:, 0]), py=jnp.asarray(p[:, 1]),
        pz=jnp.asarray(p[:, 2]),
        nx=jnp.zeros(n), ny=jnp.ones(n), nz=jnp.zeros(n),
        radius=jnp.full((n,), radius, jnp.float32),
        colors=jnp.asarray(col), obj_row=int(obj_row), as_spheres=True)


def disk_sweep(ps: PointSetArrays, org, dirn, t_max, chunk: int = 4096):
    """Closest disk hit: (t, point index, rim flag). Dense chunked sweep.

    Disk test (reference Disk::intersection, Geometry.h:1106-1122): plane
    hit then |P-c|^2 <= r^2; rim when > (0.95 r)^2 (PointSet.cpp:211-215).
    """
    n = org.shape[0]
    ox, oy, oz = org[:, 0:1], org[:, 1:2], org[:, 2:3]
    dx, dy, dz = dirn[:, 0:1], dirn[:, 1:2], dirn[:, 2:3]
    best_t = t_max
    best_i = jnp.full((n,), -1, jnp.int32)
    total = ps.num_points
    for start in range(0, total, chunk):
        sl = slice(start, min(start + chunk, total))
        cx, cy, cz = ps.px[sl], ps.py[sl], ps.pz[sl]
        nx, ny, nz = ps.nx[sl], ps.ny[sl], ps.nz[sl]
        dn = dx * nx + dy * ny + dz * nz
        t = ((cx - ox) * nx + (cy - oy) * ny + (cz - oz) * nz) / dn
        hx = ox + t * dx - cx
        hy = oy + t * dy - cy
        hz = oz + t * dz - cz
        r2 = hx * hx + hy * hy + hz * hz
        ok = (t > 0.0) & (r2 <= ps.radius[sl] ** 2) & ~jnp.isnan(t)
        t = jnp.where(ok, t, BIG_T)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
        win = tj < best_t
        best_i = jnp.where(win, j.astype(jnp.int32) + start, best_i)
        best_t = jnp.where(win, tj, best_t)
    return best_t, best_i
