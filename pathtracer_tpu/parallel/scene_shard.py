"""Scene-sharded intersection: the BVH partitioned across chips.

The 23.7M-triangle config cannot hold its BVH on one chip's memory budget
(SURVEY §7 'sharded BVH').  The TPU-native mechanism: partition the
triangle set spatially (contiguous ranges of the BVH build order are
spatially coherent), give each chip one partition + its sub-BVH, and
combine per-ray closest hits across the 'scene' mesh axis.

This module implements the broadcast-combine form — every chip intersects
the full ray wavefront against its partition, and an all-gather + argmin
picks the winner.  It is exact and simple; the refinement (ray-sorted
all-to-all routing rays only to partitions whose AABB they enter,
SURVEY §2.7) reuses the same partition layout.

Works today on the virtual CPU mesh; on a pod the same shard_map runs over
ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import bvh as bvh_mod
from ..ops import traverse

BIG_T = np.float32(1e30)


class ShardedMesh(NamedTuple):
    """(D, Tpad) per-partition triangle soup components + validity mask."""

    soup: traverse.TriSoup     # each leaf (D, Tpad)
    valid: jnp.ndarray         # (D, Tpad) bool
    tri_base: jnp.ndarray      # (D,) int32 — partition offset in BVH order
    order: np.ndarray          # (T,) global BVH order (host)


def partition_mesh(tri_verts: np.ndarray, n_shards: int) -> ShardedMesh:
    """Partition triangles into spatially-coherent equal chunks.

    A global BVH build provides the spatial ordering; contiguous ranges of
    that order become the per-chip partitions.
    """
    t = tri_verts.shape[0]
    fb = bvh_mod.build_bvh(tri_verts)
    ordered = tri_verts[fb.order]
    tpad = -(-t // n_shards)
    pad = n_shards * tpad - t
    if pad:
        ordered = np.concatenate(
            [ordered, np.zeros((pad, 3, 3), np.float32)], axis=0)
    soup_flat = traverse.make_soup(ordered)
    soup = traverse.TriSoup(*[jnp.asarray(np.asarray(x).reshape(
        n_shards, tpad)) for x in soup_flat])
    valid = (np.arange(n_shards * tpad) < t).reshape(n_shards, tpad)
    base = (np.arange(n_shards) * tpad).astype(np.int32)
    return ShardedMesh(soup=soup, valid=jnp.asarray(valid),
                       tri_base=jnp.asarray(base), order=fb.order)


def make_sharded_hit(mesh: Mesh, axis: str = 'scene'):
    """Jitted (sharded_mesh, org, dirn) -> (t, global_tri) closest hit.

    Rays replicated; triangles sharded over `axis`; the winner is chosen by
    an all-gather + argmin over the axis (D is small).
    """

    def body(soup, valid, base, org, dirn):
        soup_local = traverse.TriSoup(*[x[0] for x in soup])
        mh = traverse.brute_force_hit(soup_local, org, dirn)
        # mask padded triangles
        tri_ok = (mh.tri >= 0) & jnp.take(
            valid[0], jnp.maximum(mh.tri, 0))
        t = jnp.where(tri_ok, mh.t, BIG_T)
        gtri = jnp.where(tri_ok, mh.tri + base[0], -1)
        # combine across scene shards
        t_all = jax.lax.all_gather(t, axis)          # (D, N)
        g_all = jax.lax.all_gather(gtri, axis)
        j = jnp.argmin(t_all, axis=0)
        lane = jnp.arange(t.shape[0])
        return t_all[j, lane], g_all[j, lane]

    f = shard_map(
        body, mesh=mesh,
        in_specs=(traverse.TriSoup(*([P(axis)] * 16)), P(axis), P(axis),
                  P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(f)
