"""Ray->cluster ROUTED sweeps: the per-lane work-reduction tier above
two_level_hit (the "(c) per-lane cluster assignment" structural path of
the pallas_cluster ceiling analysis).

two_level_hit sweeps, per 1024-ray packet, the UNION of clusters any
lane enters (sorted near-first with an early break).  Coherent packets
still overdraw: a lane typically enters 1-3 clusters while the packet
union holds ~8, and only ~a third of lanes are live in any given slot.
The routed formulation inverts the loop:

  1. cull once (packet-level, unchanged) -> per-packet slot tables;
  2. recompute per-LANE slab entries for the first KS slots and pick
     each lane's nearest-entry cluster;
  3. route: stable-sort rays by that cluster id, pad each cluster's run
     of rays to BLOCK, and sweep every run as a single-slot packet with
     the UNCHANGED cluster_sweep kernel (rays gathered into run order —
     100% lane utilization, exactly one slot per ray);
  4. seal: re-run the ordinary packet sweep with each lane's tightened
     best t as tmax.  The kernel's whole-cluster slab skip and sorted
     early break then discard almost every slot, and the pass restores
     exactness: any hit the nearest-cluster round missed (occlusion from
     a farther cluster is impossible, but a NEARER hit in a different
     cluster is) is found here, and packet overflow (count > MAXC) is
     still healed by the tightened re-cull refine rounds.

Everything outside the existing Pallas kernel is plain XLA: one
argsort + bincount/cumsum layout, block-aligned gathers (the run id is
constant inside a block, so searchsorted runs per block, not per lane),
and one unique-index scatter to map run results back to rays.

Counterpart of the reference's coherent/incoherent traversal hints
(Geometry.h:1392-1394) taken to their TPU conclusion: rays are sorted to
the acceleration structure, not the structure walked per ray.

MEASURED RESULT (v5e, round 2) — the packet path WINS and stays the
default (scene/mesh.py use_routed=False):
  * closed 2.4M-tri sphere, 1080p primaries: two_level 4.8M rays/s,
    routed 2.4M (bit-identical hits);
  * 1M-tri terrain, top-down: two_level 6.0M, routed 3.1M;
  * fully incoherent rays (random origins on the surface, random dirs):
    both 0.12M — the seal/packet sweep dominates either way once every
    packet overflows MAXC.
Why: the sweep kernel's in-kernel progressive tightening + subtile AABB
skip already recover most of the per-lane benefit, while routing pays an
argsort, block-aligned gathers, one scatter, and a seal pass that
re-visits the packet tables.  The module stays as the evaluated
alternative (and the run machinery is reusable for sparse probe batches
where packet occupancy is the bottleneck).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import pallas_cluster as pc

BIG_T = pc.BIG_T
BLOCK = pc.BLOCK


def _lane_entries(cb, ids, org, dirn, tmax, ks: int):
    """Per-lane slab entries for each packet's first ks emitted slots.

    Returns (ent (N, ks) f32 — BIG_T for dead/missed slots,
             cid (N, ks) i32 — -1 where the slot is empty).
    Work arrays ride as (ks, BLOCK) sublane x lane planes per packet
    (the (BLOCK, small) layout would lane-pad 16x — CLAUDE.md rule)."""
    lox, loy, loz, hix, hiy, hiz = cb
    n = org.shape[0]
    nb = n // BLOCK
    idk = ids[:, :ks]

    def per_packet(xs):
        o, d, tm, ii = xs                     # (B,3) (B,3) (B,) (ks,)
        sel = jnp.maximum(ii, 0)
        iv = 1.0 / d

        def axis(lo_a, hi_a, o_a, iv_a):
            t1 = (lo_a[:, None] - o_a[None, :]) * iv_a[None, :]
            t2 = (hi_a[:, None] - o_a[None, :]) * iv_a[None, :]
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        n1, x1 = axis(lox[sel], hix[sel], o[:, 0], iv[:, 0])
        n2, x2 = axis(loy[sel], hiy[sel], o[:, 1], iv[:, 1])
        n3, x3 = axis(loz[sel], hiz[sel], o[:, 2], iv[:, 2])
        tmin = jnp.maximum(n1, jnp.maximum(n2, n3))       # (ks, B)
        tmx = jnp.minimum(x1, jnp.minimum(x2, x3))
        entry = jnp.maximum(tmin, 0.0)
        live = ((tmx >= entry) & (tmin < tm[None, :])
                & (ii >= 0)[:, None])
        return jnp.where(live, entry, BIG_T)              # (ks, B)

    ent = jax.lax.map(per_packet,
                      (org.reshape(nb, BLOCK, 3),
                       dirn.reshape(nb, BLOCK, 3),
                       tmax.reshape(nb, BLOCK), idk))     # (nb, ks, B)
    ent = jnp.transpose(ent, (0, 2, 1)).reshape(n, ks)
    cid = jnp.broadcast_to(idk[:, None, :],
                           (nb, BLOCK, ks)).reshape(n, ks)
    return ent, cid


def _route_and_sweep(packed, org, dirn, tmin, cid, t_cur, tri, al, be,
                     n_clusters: int, interpret: bool):
    """Sweep each lane against ONE cluster (cid; n_clusters = dead) by
    sorting lanes into per-cluster runs padded to BLOCK."""
    n = org.shape[0]
    C = n_clusters
    order = jnp.argsort(cid)                              # stable
    cid_s = cid[order]
    counts = jnp.bincount(cid, length=C + 1)[:C].astype(jnp.int32)
    off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(counts)])           # (C+1,)
    padded = ((counts + BLOCK - 1) // BLOCK) * BLOCK
    pad_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)])       # (C+1,)

    p_cap = n + C * BLOCK              # every cluster wastes < one block
    nb_runs = p_cap // BLOCK
    starts = jnp.arange(nb_runs, dtype=jnp.int32) * BLOCK
    # run id is constant inside a block: binary-search per BLOCK only.
    # side='right' lands on the non-empty cluster at shared boundaries
    # (empty clusters contribute zero-width intervals).
    c_b = jnp.searchsorted(pad_off, starts, side='right') - 1
    valid_b = c_b < C
    c_bc = jnp.clip(c_b, 0, C - 1)
    rank = (starts - pad_off[c_bc])[:, None] \
        + jnp.arange(BLOCK, dtype=jnp.int32)[None, :]     # (nb_runs, B)
    valid = valid_b[:, None] & (rank < counts[c_bc][:, None])
    src_sorted = jnp.clip(off[c_bc][:, None] + rank, 0, n - 1)
    ray = order[src_sorted].reshape(-1)                   # (p_cap,)
    vflat = valid.reshape(-1)

    ids_r = jnp.where(valid_b, c_bc, 0).astype(jnp.int32)[:, None]
    cnt_r = valid_b.astype(jnp.int32)[:, None]
    key_r = jnp.zeros((nb_runs, 1), jnp.float32)
    org_p = org[ray]
    dir_p = dirn[ray]
    tmax_p = jnp.where(vflat, t_cur[ray], -1.0)
    tmin_p = tmin[ray]
    # chunked: scalar-prefetch tables lane-pad (nb,1) -> (nb,128) in
    # SMEM, so thousands of run-packets in one call blow the 1MB budget
    t_p, tri_p, al_p, be_p = _sweep_full(
        ids_r, cnt_r, key_r, packed, org_p, dir_p, tmax_p, tmin_p,
        interpret)

    # run-order result position of each SORTED row, scattered back to
    # ray order once (unique indices), then everything else is gathers
    i = jnp.arange(n, dtype=jnp.int32)
    c_sc = jnp.clip(cid_s, 0, C - 1)
    pos_sorted = jnp.where(cid_s < C, pad_off[c_sc] + (i - off[c_sc]), 0)
    pos_ray = jnp.zeros((n,), jnp.int32).at[order].set(pos_sorted)
    alive = cid < C
    t_c = t_p[pos_ray]
    win = alive & (t_c < t_cur)
    return (jnp.where(win, t_c, t_cur),
            jnp.where(win, tri_p[pos_ray], tri),
            jnp.where(win, al_p[pos_ray], al),
            jnp.where(win, be_p[pos_ray], be))


def _sweep_full(ids, counts, keys, packed, org, dirn, tmax, tmin,
                interpret: bool):
    """cluster_sweep over full MAXC slot tables, chunked so the SMEM
    prefetch tables stay inside the 1MB budget (same bound as
    _two_level_exec's chunking)."""
    n = org.shape[0]
    nb = n // BLOCK
    if nb <= pc.CHUNK_PACKETS:
        return pc.cluster_sweep(ids, counts, keys, packed, org, dirn,
                                tmax, tmin, interpret=interpret)
    k, n_pad = pc._chunk_packets(n)
    org, dirn, tmax, tmin = pc._pad_rays(org, dirn, tmax, tmin, n_pad)
    nb_pad = n_pad // BLOCK
    zpad = nb_pad - nb
    ids = jnp.concatenate([ids, jnp.zeros((zpad, ids.shape[1]),
                                          ids.dtype)])
    counts = jnp.concatenate([counts, jnp.zeros((zpad, 1), counts.dtype)])
    keys = jnp.concatenate([keys, jnp.full((zpad, keys.shape[1]), BIG_T)])

    def one(xs):
        i_, c_, k_, o, d, tx, tn = xs
        return pc.cluster_sweep(i_, c_, k_, packed, o, d, tx, tn,
                                interpret=interpret)

    cp = pc.CHUNK_PACKETS
    t, tri, al, be = jax.lax.map(
        one, (ids.reshape(k, cp, -1), counts.reshape(k, cp, 1),
              keys.reshape(k, cp, -1), org.reshape(k, -1, 3),
              dirn.reshape(k, -1, 3), tmax.reshape(k, -1),
              tmin.reshape(k, -1)))
    return (t.reshape(-1)[:n], tri.reshape(-1)[:n],
            al.reshape(-1)[:n], be.reshape(-1)[:n])


@functools.partial(
    jax.jit,
    static_argnames=('n_clusters', 'top_max_leaf', 'interpret', 'rounds',
                     'ks', 'refine_rounds'))
def _routed_exec(arrays, org, dirn, tmax, tmin, *, n_clusters: int,
                 top_max_leaf: int, interpret: bool, rounds: int,
                 ks: int, refine_rounds: int):
    cm = pc.cluster_from_arrays(arrays, n_clusters, top_max_leaf)
    n = org.shape[0]
    tmax_orig = tmax
    tmax = pc.root_exit_clamp(cm, org, dirn, tmax)

    ids, counts, keys = pc.cluster_cull(cm, org, dirn, tmax,
                                        interpret=interpret)
    cb = (cm.cb_lox, cm.cb_loy, cm.cb_loz,
          cm.cb_hix, cm.cb_hiy, cm.cb_hiz)
    ent, cid_k = _lane_entries(cb, ids, org, dirn, tmax, ks)

    t_cur = tmax
    tri = jnp.full((n,), -1, jnp.int32)
    al = jnp.ones((n,), jnp.float32)
    be = jnp.zeros((n,), jnp.float32)

    for _ in range(rounds):
        # this round's per-lane nearest live slot; consumed afterwards
        e_min = jnp.min(ent, axis=1)
        j = jnp.argmin(ent, axis=1)
        cid = jnp.take_along_axis(cid_k, j[:, None], axis=1)[:, 0]
        cid = jnp.where((e_min < t_cur) & (cid >= 0), cid, n_clusters)
        ent = jnp.where(jnp.arange(ks)[None, :] == j[:, None], BIG_T, ent)
        t_cur, tri, al, be = _route_and_sweep(
            cm.packed, org, dirn, tmin, cid, t_cur, tri, al, be,
            n_clusters, interpret)

    # seal with the ordinary packet sweep at the tightened per-lane t:
    # restores exactness (a nearer hit in a lane's non-nearest cluster),
    # and the kernel's slab skip + sorted early break make it cheap
    t_s, tri_s, al_s, be_s = _sweep_full(ids, counts, keys, cm.packed,
                                         org, dirn, t_cur, tmin,
                                         interpret)
    win = t_s < t_cur
    t_cur = jnp.where(win, t_s, t_cur)
    tri = jnp.where(win, tri_s, tri)
    al = jnp.where(win, al_s, al)
    be = jnp.where(win, be_s, be)
    res = pc._residual_lanes(counts, keys, t_cur)

    def refine(args):
        t_cur, tri, al, be, _res = args
        ids2, counts2, keys2 = pc.cluster_cull(cm, org, dirn, t_cur,
                                               interpret=interpret)
        t2, tri2, al2, be2 = _sweep_full(ids2, counts2, keys2, cm.packed,
                                         org, dirn, t_cur, tmin,
                                         interpret)
        win = t2 < t_cur
        return (jnp.where(win, t2, t_cur), jnp.where(win, tri2, tri),
                jnp.where(win, al2, al), jnp.where(win, be2, be),
                pc._residual_lanes(counts2, keys2,
                                   jnp.where(win, t2, t_cur)))

    state = (t_cur, tri, al, be, res)
    for _ in range(refine_rounds):
        state = jax.lax.cond(jnp.any(state[4]), refine, lambda a: a,
                             state)
    t_cur, tri, al, be, res = state
    t_cur = jnp.where(tri >= 0, t_cur, tmax_orig)
    return t_cur, tri, al, be, res


def routed_hit(cm: pc.ClusteredMesh, org, dirn, tmax, tmin=None,
               interpret: bool = False, rounds: int = 1, ks: int = 8,
               refine_rounds: int = 1, return_residual: bool = False,
               soup=None, with_bary: bool = True):
    """Closest hit via routed per-lane sweeps + packet seal.

    Same contract as two_level_hit: (t, tri, alpha, beta), tri in
    cluster/BVH soup order, miss lanes return the caller's tmax; with
    return_residual=True a fifth (N,) bool marks lanes still unresolved
    after refinement (callers reroute them to an exact fallback)."""
    n_orig = org.shape[0]
    pad = (-n_orig) % BLOCK
    org, dirn, tmax, tmin = pc._pad_rays(org, dirn, tmax, tmin,
                                         n_orig + pad)
    n = org.shape[0]
    if tmin is None:
        tmin = jnp.full((n,), -1.0, jnp.float32)
    t, tri, al, be, res = _routed_exec(
        pc.cluster_arrays(cm), org, dirn, tmax, tmin,
        n_clusters=cm.n_clusters, top_max_leaf=cm.top_max_leaf,
        interpret=interpret, rounds=rounds, ks=ks,
        refine_rounds=refine_rounds)
    # lean sweep kernel: winners only — recompute barycentrics per ray
    # (with_bary=False callers fold it into their own shading gather)
    if with_bary:
        al, be = pc.recompute_bary(
            soup if soup is not None else pc._soup_for(cm), org, dirn,
            t, tri)
    out = (t[:n_orig], tri[:n_orig], al[:n_orig], be[:n_orig])
    if return_residual:
        return out + (res[:n_orig],)
    return out
