"""Pallas packet BVH traversal — the TPU-native intersection kernel.

Per-lane stack traversal (the GPU/CPU norm, reference:
TriangleMesh.cpp:1133-1235) is hostile to TPU: per-lane dynamic indexing
serializes into scalar gathers (measured 0.02M rays/s via XLA).  The
TPU-native formulation is PACKET traversal — the wide-vector descendant of
the reference's 16-wide Embree ray packets (Geometry.cpp:486-533):

  * a BLOCK of rays traverses the tree together;
  * the stack lives in SMEM and is driven by SCALAR control flow;
  * node AABBs are fetched with scalar dynamic indexing (supported and
    fast) and slab-tested against ALL lanes as one vector op;
  * a subtree is descended if ANY lane wants it (vector reduction -> scalar);
  * leaves test their <=max_leaf triangles against all lanes.

Efficiency tracks ray coherence within a block — primary rays in pixel
order are coherent; the wavefront's ray sorting (SURVEY §2.7) feeds this.
All arrays are 1D (M,)/(T,) components (TPU layout rule: no small trailing
dims), VMEM-resident for meshes up to ~150k triangles; HBM-streamed nodes
via double-buffered DMA extend to the multi-million-triangle configs next.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import TriSoup

BIG_T = np.float32(1e30)
BLOCK = 1024
STACK_DEPTH = 64


def _traverse_kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
                     na_ref, nb_ref, nleaf_ref,
                     ax_ref, ay_ref, az_ref, ux_ref, uy_ref, uz_ref,
                     vx_ref, vy_ref, vz_ref, nx_ref, ny_ref, nz_ref,
                     m11_ref, m12_ref, m22_ref, invd_ref,
                     org_ref, dir_ref, tmax_ref, tmin_ref,
                     tout_ref, triout_ref, alout_ref, beout_ref,
                     stack_ref, *, max_leaf: int):
    """One grid step: BLOCK rays vs the whole (VMEM-resident) BVH."""
    ox = org_ref[:, 0]
    oy = org_ref[:, 1]
    oz = org_ref[:, 2]
    dx = dir_ref[:, 0]
    dy = dir_ref[:, 1]
    dz = dir_ref[:, 2]
    ix = 1.0 / dx
    iy = 1.0 / dy
    iz = 1.0 / dz

    tout_ref[:, 0] = tmax_ref[:, 0]
    triout_ref[:, 0] = jnp.full((BLOCK,), -1, jnp.int32)
    alout_ref[:, 0] = jnp.ones((BLOCK,), jnp.float32)
    beout_ref[:, 0] = jnp.zeros((BLOCK,), jnp.float32)

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
        live = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < tout_ref[:, 0])
        return jnp.any(live)

    def leaf_case(args):
        sp, start, count = args
        for k in range(max_leaf):
            @pl.when(k < count)
            def _():
                tri = start + k
                ax = ax_ref[tri]
                ay = ay_ref[tri]
                az = az_ref[tri]
                nx = nx_ref[tri]
                ny = ny_ref[tri]
                nz = nz_ref[tri]
                dn = dx * nx + dy * ny + dz * nz
                t = ((ax - ox) * nx + (ay - oy) * ny + (az - oz) * nz) / dn
                px = ox + t * dx - ax
                py = oy + t * dy - ay
                pz = oz + t * dz - az
                b11 = px * ux_ref[tri] + py * uy_ref[tri] + pz * uz_ref[tri]
                b21 = px * vx_ref[tri] + py * vy_ref[tri] + pz * vz_ref[tri]
                beta = (b11 * m22_ref[tri] - b21 * m12_ref[tri]) \
                    * invd_ref[tri]
                gamma = (b21 * m11_ref[tri] - b11 * m12_ref[tri]) \
                    * invd_ref[tri]
                alpha = 1.0 - beta - gamma
                ok = ((t >= 0.0) & (beta >= 0.0) & (gamma >= 0.0)
                      & (alpha >= 0.0) & (t < tout_ref[:, 0])
                      & (t > tmin_ref[:, 0]) & ~jnp.isnan(t))
                tout_ref[:, 0] = jnp.where(ok, t, tout_ref[:, 0])
                triout_ref[:, 0] = jnp.where(ok, tri, triout_ref[:, 0])
                alout_ref[:, 0] = jnp.where(ok, alpha, alout_ref[:, 0])
                beout_ref[:, 0] = jnp.where(ok, beta, beout_ref[:, 0])
        return sp

    def inner_case(args):
        sp, a, b = args
        any_l = node_live(a)
        any_r = node_live(b)
        # push right first so left pops first (near-by-layout heuristic);
        # both pushes clamp to the top slot — pack_bvh rejects trees deeper
        # than STACK_DEPTH so the clamp can never fire in practice, it only
        # guards the SMEM bounds
        @pl.when(any_r)
        def _():
            stack_ref[jnp.minimum(sp, STACK_DEPTH - 1)] = b
        sp1 = jnp.where(any_r, sp + 1, sp)
        @pl.when(any_l)
        def _():
            stack_ref[jnp.minimum(sp1, STACK_DEPTH - 1)] = a
        return jnp.where(any_l, sp1 + 1, sp1)

    def body(sp):
        node = stack_ref[sp - 1]
        sp = sp - 1
        a = na_ref[node]
        b = nb_ref[node]
        is_leaf = nleaf_ref[node] > 0
        return jax.lax.cond(is_leaf, leaf_case, inner_case, (sp, a, b))

    jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))


class PackedBVH(NamedTuple):
    """Kernel-ready 1D node arrays + TriSoup (shared with ops/traverse)."""

    lox: jnp.ndarray; loy: jnp.ndarray; loz: jnp.ndarray   # (M,)
    hix: jnp.ndarray; hiy: jnp.ndarray; hiz: jnp.ndarray
    na: jnp.ndarray      # (M,) int32: child / leaf tri start
    nb: jnp.ndarray      # (M,) int32: child / leaf tri count
    nleaf: jnp.ndarray   # (M,) int32 (1 = leaf)
    max_leaf: int


def pack_bvh(fb) -> PackedBVH:
    """Pack a FlatBVH for the packet kernel (leaf a=start, b=count)."""
    if fb.depth >= STACK_DEPTH:
        raise ValueError(
            f'BVH depth {fb.depth} >= kernel stack depth {STACK_DEPTH}; '
            f'the SMEM traversal stack would overflow (silent subtree '
            f'drops) — rebuild with a larger leaf size or raise STACK_DEPTH')
    a = np.where(fb.node_leaf, fb.node_a, fb.node_a).astype(np.int32)
    b = np.where(fb.node_leaf, fb.node_b - fb.node_a,
                 fb.node_b).astype(np.int32)
    return PackedBVH(
        lox=jnp.asarray(fb.node_lo[:, 0]), loy=jnp.asarray(fb.node_lo[:, 1]),
        loz=jnp.asarray(fb.node_lo[:, 2]),
        hix=jnp.asarray(fb.node_hi[:, 0]), hiy=jnp.asarray(fb.node_hi[:, 1]),
        hiz=jnp.asarray(fb.node_hi[:, 2]),
        na=jnp.asarray(a), nb=jnp.asarray(b),
        nleaf=jnp.asarray(fb.node_leaf.astype(np.int32)),
        max_leaf=int(fb.max_leaf),
    )


@functools.partial(jax.jit, static_argnames=('max_leaf', 'interpret'))
def packet_hit(packed_arrays, soup: TriSoup, org, dirn, tmax,
               max_leaf: int, interpret: bool = False, tmin=None):
    """Closest hit for N rays (N multiple of BLOCK) via the packet kernel.

    packed_arrays: the 9 node arrays of PackedBVH (without max_leaf).
    Returns (t, tri, alpha, beta).
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
    grid = (n // BLOCK,)
    if tmin is None:
        tmin = jnp.full((n,), -1.0, jnp.float32)

    kernel = functools.partial(_traverse_kernel, max_leaf=max_leaf)
    # node/triangle data is read with arbitrary dynamic scalar indices —
    # Mosaic only supports that from SMEM (VMEM dynamic indices must be
    # tile-aligned), so the tree lives in scalar memory.  This caps the
    # SMEM-resident tier at a few thousand primitives; the next tier pages
    # BFS-ordered subtree blocks from HBM via DMA into SMEM.
    node_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 9
    soup_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 16
    ray_spec = lambda k: pl.BlockSpec((BLOCK, k), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t, tri, al, be = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=node_specs + soup_specs + [ray_spec(3), ray_spec(3),
                                            ray_spec(1), ray_spec(1)],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*packed_arrays, *soup,
      org, dirn, tmax.reshape(n, 1), tmin.reshape(n, 1))
    return (t[:n_orig, 0], tri[:n_orig, 0], al[:n_orig, 0],
            be[:n_orig, 0])


def packet_hit_packed(packed: PackedBVH, soup: TriSoup, org, dirn, tmax,
                      interpret: bool = False, tmin=None):
    arrays = (packed.lox, packed.loy, packed.loz, packed.hix, packed.hiy,
              packed.hiz, packed.na, packed.nb, packed.nleaf)
    return packet_hit(arrays, soup, org, dirn, tmax,
                      max_leaf=packed.max_leaf, interpret=interpret,
                      tmin=tmin)
