"""Two-level cluster traversal — the TPU-native BIG-mesh intersection.

EXPERIMENTAL (round-2 groundwork): interpret-mode tested; not yet
validated on real TPU hardware.

The SMEM packet kernel (ops/pallas_bvh.py) caps at a few thousand
triangles because Mosaic only allows arbitrary dynamic scalar indexing
from SMEM (~1MB).  This module scales to millions of triangles with a
design that avoids every dynamic-indexing restriction:

  Phase 1 — cluster culling (`cluster_cull`).  Triangles are partitioned
  into fixed-size spatially-coherent CLUSTERS (contiguous ranges of the
  global BVH order, TRIS_C each).  A small top-level BVH over cluster
  AABBs lives in SMEM; the packet kernel traverses it per BLOCK-ray
  packet and emits the list of clusters the packet enters.  A 2.5M-tri
  mesh is ~1200 clusters -> ~2400 top nodes: far inside the SMEM tier.

  Phase 2 — dense sweeps via scalar-prefetch block selection
  (`cluster_sweep`).  A second kernel runs a (ray_block, slot, subtile)
  grid whose input BlockSpec *index_map reads the phase-1 cluster ids*
  (PrefetchScalarGridSpec): Pallas's pipeline DMAs exactly the selected
  cluster's triangle soup from HBM into VMEM, and the kernel runs a fully
  dense VPU sweep — no gathers, no dynamic indices, no SMEM DMA.  This is
  the block-sparse-matmul pattern applied to ray tracing.

Per-packet work scales with the clusters a coherent packet actually
enters (the wavefront's octant ray sorting feeds coherence); empty space
costs one SMEM traversal.  Packets that enter more than MAXC clusters
overflow — `cluster_cull` reports the true count so callers can route
those packets to a fallback (see `two_level_hit`'s docstring).

Counterpart of the reference's BVH traversal for its biggest scenes
(TriangleMesh.cpp:1133-1235); the cluster decomposition replaces the
deep per-ray stack with hardware-shaped dense work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bvh as bvh_mod
from .traverse import TriSoup, make_soup

BIG_T = np.float32(1e30)
BLOCK = 1024          # rays per packet (shared with pallas_bvh)
TRIS_C = 2048         # triangles per cluster (padded)
SUBT = 256            # phase-2 triangle subtile: (BLOCK, SUBT) temps = 1MB
MAXC = 48             # cluster slots per packet before overflow
STACK_DEPTH = 64


class ClusteredMesh(NamedTuple):
    """Host-built arrays for the two-level kernel."""

    # top tree, packed like PackedBVH (leaf: a=start pos, b=count)
    top_lox: jnp.ndarray; top_loy: jnp.ndarray; top_loz: jnp.ndarray
    top_hix: jnp.ndarray; top_hiy: jnp.ndarray; top_hiz: jnp.ndarray
    top_a: jnp.ndarray; top_b: jnp.ndarray; top_leaf: jnp.ndarray
    top_order: jnp.ndarray           # (C,) int32: leaf pos -> cluster id
    top_max_leaf: int
    # per-cluster triangle soup, (C, 1, TRIS_C) per component (the unit
    # middle dim satisfies Mosaic's last-two-dims block rule for the
    # (1, 1, SUBT) sweep blocks)
    soup: TriSoup
    valid: jnp.ndarray               # (C, 1, TRIS_C) f32 1/0 validity
    n_clusters: int
    order: np.ndarray                # (T,) global BVH order (host):
                                     # sweep tri index -> original tri


def build_clustered(tri_verts: np.ndarray) -> ClusteredMesh:
    """Partition by global BVH order; top BVH over cluster bounds."""
    t = tri_verts.shape[0]
    fb = bvh_mod.build_bvh(tri_verts)
    ordered = tri_verts[fb.order]
    c = -(-t // TRIS_C)
    pad = c * TRIS_C - t
    if pad:
        ordered = np.concatenate(
            [ordered, np.zeros((pad, 3, 3), np.float32)], axis=0)
    grouped = ordered.reshape(c, TRIS_C, 3, 3).astype(np.float32)
    valid = (np.arange(c * TRIS_C) < t).reshape(c, TRIS_C)
    # cluster bounds over VALID triangles only (pad tris sit at origin)
    pts = grouped.reshape(c, TRIS_C * 3, 3)
    vmask = np.repeat(valid, 3, axis=1)[:, :, None]
    clo = np.where(vmask, pts, np.inf).min(axis=1).astype(np.float32)
    chi = np.where(vmask, pts, -np.inf).max(axis=1).astype(np.float32)
    centers = ((clo + chi) * 0.5).astype(np.float32)

    top = bvh_mod.build_bvh_from_bounds(clo, chi, centers, max_leaf_size=1)
    a = top.node_a.astype(np.int32)
    b = np.where(top.node_leaf, top.node_b - top.node_a,
                 top.node_b).astype(np.int32)

    soup_flat = make_soup(ordered)
    soup = TriSoup(*[jnp.asarray(np.asarray(x).reshape(c, 1, TRIS_C))
                     for x in soup_flat])
    return ClusteredMesh(
        top_lox=jnp.asarray(top.node_lo[:, 0]),
        top_loy=jnp.asarray(top.node_lo[:, 1]),
        top_loz=jnp.asarray(top.node_lo[:, 2]),
        top_hix=jnp.asarray(top.node_hi[:, 0]),
        top_hiy=jnp.asarray(top.node_hi[:, 1]),
        top_hiz=jnp.asarray(top.node_hi[:, 2]),
        top_a=jnp.asarray(a), top_b=jnp.asarray(b),
        top_leaf=jnp.asarray(top.node_leaf.astype(np.int32)),
        top_order=jnp.asarray(top.order.astype(np.int32)),
        top_max_leaf=int(top.max_leaf),
        soup=soup,
        valid=jnp.asarray(valid.astype(np.float32).reshape(c, 1, TRIS_C)),
        n_clusters=c, order=fb.order,
    )


def _cull_kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
                 a_ref, b_ref, leaf_ref, order_ref,
                 org_ref, dir_ref, tmax_ref,
                 ids_ref, count_ref, stack_ref, *, max_leaf: int):
    """Phase 1: emit the clusters this ray packet enters."""
    ox = org_ref[:, 0]
    oy = org_ref[:, 1]
    oz = org_ref[:, 2]
    dx = dir_ref[:, 0]
    dy = dir_ref[:, 1]
    dz = dir_ref[:, 2]
    ix = 1.0 / dx
    iy = 1.0 / dy
    iz = 1.0 / dz
    tcap = tmax_ref[:, 0]
    row = pl.program_id(0)           # SMEM outputs are whole-array
                                     # (Mosaic small-block rule)

    for k in range(MAXC):
        ids_ref[row, k] = jnp.int32(-1)
    count_ref[row, 0] = jnp.int32(0)
    stack_ref[0] = jnp.int32(0)      # root

    def node_live(node):
        """Vector slab test of all lanes vs one node -> any-lane-live."""
        lox = lox_ref[node]
        loy = loy_ref[node]
        loz = loz_ref[node]
        hix = hix_ref[node]
        hiy = hiy_ref[node]
        hiz = hiz_ref[node]
        t1 = (lox - ox) * ix
        t2 = (hix - ox) * ix
        tmin = jnp.minimum(t1, t2)
        tmax = jnp.maximum(t1, t2)
        t1 = (loy - oy) * iy
        t2 = (hiy - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        t1 = (loz - oz) * iz
        t2 = (hiz - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        live = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < tcap)
        return jnp.any(live)

    def leaf_case(args):
        sp, start, count = args
        for k in range(max_leaf):
            @pl.when(k < count)
            def _():
                cnt = count_ref[row, 0]
                @pl.when(cnt < MAXC)
                def _():
                    ids_ref[row, cnt] = order_ref[start + k]
                count_ref[row, 0] = cnt + 1   # past MAXC == overflow flag
        return sp

    def inner_case(args):
        sp, a, b = args
        any_l = node_live(a)
        any_r = node_live(b)
        @pl.when(any_r)
        def _():
            stack_ref[sp] = b
        sp1 = jnp.where(any_r, sp + 1, sp)
        @pl.when(any_l)
        def _():
            stack_ref[jnp.minimum(sp1, STACK_DEPTH - 1)] = a
        return jnp.where(any_l, sp1 + 1, sp1)

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        a = a_ref[node]
        b = b_ref[node]
        is_leaf = leaf_ref[node] > 0
        return jax.lax.cond(is_leaf, leaf_case, inner_case, (sp, a, b))

    jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))


def _sweep_kernel(ids_ref,
                  ax, ay, az, ux, uy, uz, vx, vy, vz,
                  nx, ny, nz, m11, m12, m22, invd, val,
                  org_ref, dir_ref, tmax_ref, tmin_ref,
                  tout_ref, triout_ref, alout_ref, beout_ref):
    """Phase 2: dense subtile sweep of one selected cluster vs one packet.

    The cluster's soup subtile arrives in VMEM via the scalar-prefetch
    index_map — this body is pure vector arithmetic (no dynamic indices).
    """
    b = pl.program_id(0)
    k = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when((k == 0) & (s == 0))
    def _():
        tout_ref[:, 0] = tmax_ref[:, 0]
        triout_ref[:, 0] = jnp.full((BLOCK,), -1, jnp.int32)
        alout_ref[:, 0] = jnp.ones((BLOCK,), jnp.float32)
        beout_ref[:, 0] = jnp.zeros((BLOCK,), jnp.float32)

    cid = ids_ref[b, k]

    @pl.when(cid >= 0)
    def _():
        ox = org_ref[:, 0:1]
        oy = org_ref[:, 1:2]
        oz = org_ref[:, 2:3]
        dx = dir_ref[:, 0:1]
        dy = dir_ref[:, 1:2]
        dz = dir_ref[:, 2:3]
        rnx = nx[0, 0, :][None, :]
        rny = ny[0, 0, :][None, :]
        rnz = nz[0, 0, :][None, :]
        rax = ax[0, 0, :][None, :]
        ray_ = ay[0, 0, :][None, :]
        raz = az[0, 0, :][None, :]
        dn = dx * rnx + dy * rny + dz * rnz
        t = ((rax - ox) * rnx + (ray_ - oy) * rny + (raz - oz) * rnz) / dn
        px = ox + t * dx - rax
        py = oy + t * dy - ray_
        pz = oz + t * dz - raz
        b11 = (px * ux[0, 0, :][None, :] + py * uy[0, 0, :][None, :]
               + pz * uz[0, 0, :][None, :])
        b21 = (px * vx[0, 0, :][None, :] + py * vy[0, 0, :][None, :]
               + pz * vz[0, 0, :][None, :])
        beta = (b11 * m22[0, 0, :][None, :] - b21 * m12[0, 0, :][None, :]) \
            * invd[0, 0, :][None, :]
        gamma = (b21 * m11[0, 0, :][None, :] - b11 * m12[0, 0, :][None, :]) \
            * invd[0, 0, :][None, :]
        alpha = 1.0 - beta - gamma
        ok = ((t >= 0.0) & (beta >= 0.0) & (gamma >= 0.0) & (alpha >= 0.0)
              & (val[0, 0, :][None, :] > 0.5) & (t > tmin_ref[:, 0:1])
              & ~jnp.isnan(t))
        t = jnp.where(ok, t, BIG_T)
        # winner extraction by min-reductions (no gathers / argmin on TPU)
        tj = jnp.min(t, axis=-1)                              # (BLOCK,)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, SUBT), 1)
        is_win = t <= tj[:, None]
        j = jnp.min(jnp.where(is_win, lane_iota, SUBT), axis=-1)
        onehot = lane_iota == j[:, None]
        al_j = jnp.sum(jnp.where(onehot, alpha, 0.0), axis=-1)
        be_j = jnp.sum(jnp.where(onehot, beta, 0.0), axis=-1)
        win = tj < tout_ref[:, 0]
        tout_ref[:, 0] = jnp.where(win, tj, tout_ref[:, 0])
        triout_ref[:, 0] = jnp.where(win, cid * TRIS_C + s * SUBT + j,
                                     triout_ref[:, 0])
        alout_ref[:, 0] = jnp.where(win, al_j, alout_ref[:, 0])
        beout_ref[:, 0] = jnp.where(win, be_j, beout_ref[:, 0])


@functools.partial(jax.jit, static_argnames=('max_leaf', 'interpret'))
def _cull_call(top_arrays, org, dirn, tmax, max_leaf: int,
               interpret: bool = False):
    n = org.shape[0]
    grid = (n // BLOCK,)
    kernel = functools.partial(_cull_kernel, max_leaf=max_leaf)
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 10
    ray = lambda k: pl.BlockSpec((BLOCK, k), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=smem + [ray(3), ray(3), ray(1)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # whole (nb, MAXC)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # whole (nb, 1)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // BLOCK, MAXC), jnp.int32),
            jax.ShapeDtypeStruct((n // BLOCK, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*top_arrays, org, dirn, tmax.reshape(n, 1))


def cluster_cull(cm: ClusteredMesh, org, dirn, tmax, interpret=False):
    """Phase 1.  Returns (ids (nb, MAXC) int32 with -1 padding,
    count (nb, 1) int32; count > MAXC means the packet overflowed)."""
    top = (cm.top_lox, cm.top_loy, cm.top_loz, cm.top_hix, cm.top_hiy,
           cm.top_hiz, cm.top_a, cm.top_b, cm.top_leaf, cm.top_order)
    return _cull_call(top, org, dirn, tmax, max_leaf=cm.top_max_leaf,
                      interpret=interpret)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cluster_sweep(ids, soup, valid, org, dirn, tmax, tmin,
                  interpret: bool = False):
    """Phase 2: dense per-cluster sweeps driven by the phase-1 id lists."""
    n = org.shape[0]
    nb = n // BLOCK

    def csel(b, k, s, ids):
        # clamp -1 slots (skipped in-kernel)
        return (jnp.maximum(ids[b, k], 0), 0, s)

    cluster = pl.BlockSpec((1, 1, SUBT), csel, memory_space=pltpu.VMEM)
    ray = lambda c: pl.BlockSpec((BLOCK, c), lambda b, k, s, ids: (b, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.BlockSpec((BLOCK, 1), lambda b, k, s, ids: (b, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, MAXC, TRIS_C // SUBT),
        in_specs=[cluster] * 17 + [ray(3), ray(3), ray(1), ray(1)],
        out_specs=[out] * 4,
    )
    t, tri, al, be = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(ids, *soup, valid, org, dirn, tmax.reshape(n, 1), tmin.reshape(n, 1))
    return t[:, 0], tri[:, 0], al[:, 0], be[:, 0]


def two_level_hit(cm: ClusteredMesh, org, dirn, tmax, tmin=None,
                  interpret=False):
    """Full two-level closest hit: (t, tri, alpha, beta) like packet_hit.

    tri indexes the BVH-ordered soup (map through cm.order for original
    ids).  Packets visiting > MAXC clusters are truncated — check
    `cluster_cull` counts and reroute those packets to brute force if the
    scene demands it (coherent primary/shadow packets stay well under).
    """
    n_orig = org.shape[0]
    pad = (-n_orig) % BLOCK
    if pad:
        org = jnp.concatenate([org, jnp.full((pad, 3), 1e6, org.dtype)])
        dirn = jnp.concatenate([dirn, jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0], dirn.dtype), (pad, 3))])
        tmax = jnp.concatenate([tmax, jnp.full((pad,), -1.0, tmax.dtype)])
        if tmin is not None:
            tmin = jnp.concatenate([tmin, jnp.zeros((pad,), tmin.dtype)])
    n = org.shape[0]
    if tmin is None:
        tmin = jnp.full((n,), -1.0, jnp.float32)
    ids, _count = cluster_cull(cm, org, dirn, tmax, interpret=interpret)
    t, tri, al, be = cluster_sweep(ids, cm.soup, cm.valid, org, dirn,
                                   tmax, tmin, interpret=interpret)
    return t[:n_orig], tri[:n_orig], al[:n_orig], be[:n_orig]
