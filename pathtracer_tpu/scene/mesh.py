"""Device-side triangle meshes: soup + BVH + per-group materials.

TPU-native counterpart of TriMesh (reference: TriangleMesh.h:115-260) as a
flax pytree: flat SoA triangle/BVH arrays (built host-side by io/obj.py and
ops/bvh.py), per-group constant material channels (MTL multipliers —
texture images arrive with models/texture.py), interpolated shading normals
(reference getMaterial, TriangleMesh.cpp:940-948).

Each mesh is bound to a row of the analytic object table (its transform,
miroir/ghost flags and keyframes live there, like the reference's
Object base-class state).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.struct

from ..io import obj as obj_io
from ..ops import bvh as bvh_mod
from ..ops import traverse


@flax.struct.dataclass
class MeshArrays:
    # soup/bvh are None on LEAN cluster-tier meshes (the packed cluster
    # A-matrices + shade_pack carry everything device-side; the reference
    # similarly keeps ONE triangleSoup copy, TriangleMesh.cpp:813-829)
    soup: Optional[traverse.TriSoup]
    bvh: Optional[traverse.BVHArrays]
    # shading attributes, in BVH triangle order
    n0: jnp.ndarray          # (T,3) per-corner shading normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray         # (T,2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    t0: jnp.ndarray          # (T,3) per-corner tangents (normal mapping)
    t1: jnp.ndarray
    t2: jnp.ndarray
    group: jnp.ndarray       # (T,) int32
    vc0: Optional[jnp.ndarray]   # (T,3) vertex colors or None
    vc1: Optional[jnp.ndarray]
    vc2: Optional[jnp.ndarray]
    # wireframe edge flags (T,3) bool, BVH order — real polygon borders
    # only (fan-triangulation interior edges stay hidden); kept on device
    # only when display_edges (TriangleMesh.cpp:978-1023)
    show_edges: Optional[jnp.ndarray]
    # per-face overlay colors (T,3) from .seg/.lab files, or None
    # (mainApp.cpp:2311-2377; overrides Kd like reference facecolors)
    facecolors: Optional[jnp.ndarray]
    # per-group constant materials (differentiable leaves)
    g_kd: jnp.ndarray        # (G,3)
    g_ks: jnp.ndarray        # (G,3)
    g_ne: jnp.ndarray        # (G,3)
    g_ksub: jnp.ndarray      # (G,3)
    g_transp: jnp.ndarray    # (G,) bool
    g_refr: jnp.ndarray      # (G,)
    # per-group texture images (static structure; None entries = constant)
    textures: tuple          # tuple of models.texture.GroupTextures, len G
    # packet-kernel node arrays (ops/pallas_bvh.PackedBVH tuple) or None
    packed: tuple
    # two-level cluster-kernel arrays (ops/pallas_cluster.cluster_arrays)
    # for the big-mesh tier, or ()
    clustered: tuple
    # statics
    obj_row: int = flax.struct.field(pytree_node=False)
    max_leaf: int = flax.struct.field(pytree_node=False)
    use_brute: bool = flax.struct.field(pytree_node=False)
    use_packet: bool = flax.struct.field(pytree_node=False)
    use_cluster: bool = flax.struct.field(pytree_node=False)
    n_clusters: int = flax.struct.field(pytree_node=False)
    cluster_top_max_leaf: int = flax.struct.field(pytree_node=False)
    interp_normals: bool = flax.struct.field(pytree_node=False)
    display_edges: bool = flax.struct.field(pytree_node=False, default=False)
    # per-channel texture atlases (models.texture.CHANNELS order; each a
    # ChannelAtlas or None) — built for many-group meshes so material
    # fetch does ONE gather per channel instead of a G-long select chain
    atlases: tuple = ()
    # bilinear texture filtering option (reference is point-sampled)
    bilinear: bool = flax.struct.field(pytree_node=False, default=False)
    # cluster-tier backface cull enabled: the mesh is a closed,
    # consistently oriented 2-manifold (topology.closed_orientation)
    # with NO transparency / subsurface / alpha-cutout anywhere (group
    # constants or texture channels), so rays can only originate outside
    # it and the normal-bound cull in ops/pallas_cluster is EXACT (the
    # orientation sign is baked into ClusteredMesh.nrm at build).
    # build_scene additionally clears this for ghost / flipped objects
    # and when another object's AABB overlaps this mesh's (its surface
    # could seed ray origins inside); the Renderer clears it when the
    # camera sits inside the mesh AABB.
    backface_cull: bool = flax.struct.field(pytree_node=False,
                                            default=False)
    # alpha-cutout re-intersection rounds (reference's in-leaf skip is
    # unbounded, TriangleMesh.cpp:1199-1205; each round is one traversal)
    cutout_rounds: int = flax.struct.field(pytree_node=False, default=4)
    # cluster tier variant: routed per-lane sweeps (ops/routed_cluster)
    # vs plain packet two_level_hit.  Measured on v5e (see the routed
    # module docstring): routed is ~2x SLOWER on coherent primaries and
    # equal on fully incoherent rays, so the packet path stays default;
    # the flag remains for future regimes (e.g. sparse SS probes).
    use_routed: bool = flax.struct.field(pytree_node=False, default=False)
    # MERGED multi-mesh support (the Embree top-level instance-BVH
    # analogue, Geometry.cpp:627-674): a merged mesh holds several
    # source objects' triangles baked to world space under ONE BVH, so a
    # scene with many meshes pays one traversal per bounce instead of
    # one per mesh.  group_rows maps each material group to its source
    # object row (per-lane flags/transforms resolve by gather).
    group_rows: Optional[jnp.ndarray] = None     # (G,) int32 or None
    world_space: bool = flax.struct.field(pytree_node=False, default=False)
    # packed per-triangle shading attributes: the material fetch does ONE
    # (T, C) row gather instead of ~7 separate per-lane gathers (each
    # separate (T,3) gather materializes a full lane-padded tile row per
    # lane on TPU — they dominated the e2e wave's non-sweep time).
    # shade_cols maps name -> (start, width) into the packed row; int32
    # columns (group) are bitcast to f32 (gathers move bits, no math).
    shade_pack: Optional[jnp.ndarray] = None     # (T, C) f32
    shade_cols: tuple = flax.struct.field(pytree_node=False, default=())
    # SCENE-AXIS sharding (config 5: the 23.7M-tri BVH split across
    # chips, SURVEY §7 'sharded BVH').  When scene_axis is set the
    # cluster arrays and shade_pack carry a leading (D,) device axis
    # (leading (1,) inside shard_map bodies — parallel/scene_shard
    # localize_scene strips it): each device culls+sweeps ONLY its
    # cluster partition and the scene combines winners with an
    # all_gather+argmin over the axis; shading rows are fetched with an
    # in-range local gather + psum.  tri ids stay GLOBAL BVH positions
    # (cluster starts ride the packed tail), so partitions compose for
    # free.  Counterpart of the reference's single top-level Embree
    # scene over instanced meshes (Geometry.cpp:589-688) at scales one
    # chip cannot hold.
    scene_axis: Optional[str] = flax.struct.field(pytree_node=False,
                                                  default=None)
    shard_row0: Optional[jnp.ndarray] = None     # (D,) i32 first OWNED
                                                 # shade_pack row (global)
    shard_rows: Optional[jnp.ndarray] = None     # (D,) i32 owned row count
    # triangle count as static metadata (lean meshes carry no soup)
    n_tris: int = flax.struct.field(pytree_node=False, default=-1)

    @property
    def num_triangles(self):
        return self.n_tris if self.n_tris >= 0 else self.soup.ax.shape[0]


BRUTE_FORCE_MAX_TRIS = 8192   # below this, dense sweep beats traversal on TPU
PACKET_MAX_TRIS = 8000        # SMEM-resident tier (~1MB scalar memory)
ATLAS_MIN_GROUPS = 5          # textured groups before the atlas pays off


def upload_mesh(md: obj_io.MeshData, obj_row: int,
                interp_normals: bool = True,
                use_brute: Optional[bool] = None,
                use_cluster: Optional[bool] = None,
                load_textures: bool = True,
                default_ksub=(0.0, 0.0, 0.0),
                default_transp: bool = False,
                default_refr: float = 1.3,
                display_edges: bool = False,
                facecolors=None,
                texture_overrides=None,
                use_atlas: Optional[bool] = None,
                bilinear: bool = False,
                cutout_rounds: int = 4,
                use_routed: bool = False,
                group_rows=None,
                world_space: bool = False,
                group_transp=None,
                group_refr=None,
                group_ksub=None,
                lean: Optional[bool] = None,
                allow_backface: bool = True,
                edge_colors=None) -> MeshArrays:
    """Build BVH + device arrays from host MeshData (TriMesh::init tail,
    TriangleMesh.cpp:784-841)."""
    from ..models import texture as tex_mod
    import os
    tri_verts = md.vertices[md.vtx_idx]                     # (T,3,3)
    fb = bvh_mod.build_bvh(tri_verts)
    order = fb.order
    # host-side soup first; the device copy uploads only on non-lean
    # meshes (the LEAN big-mesh tier ships packed clusters + shade_pack
    # ONLY — the reference likewise keeps one triangleSoup copy,
    # TriangleMesh.cpp:813-829)
    host_soup = traverse.make_soup(tri_verts[order], device=False)

    n_idx = md.n_idx[order]
    normals = md.normals if len(md.normals) else np.zeros((1, 3), np.float32)
    n0 = normals[np.clip(n_idx[:, 0], 0, len(normals) - 1)]
    n1 = normals[np.clip(n_idx[:, 1], 0, len(normals) - 1)]
    n2 = normals[np.clip(n_idx[:, 2], 0, len(normals) - 1)]

    uv_idx = md.uv_idx[order]
    has_uv = len(md.uvs) > 0
    uvs = md.uvs if has_uv else np.zeros((1, 2), np.float32)
    uvc = np.clip(uv_idx, 0, len(uvs) - 1)
    uv0, uv1, uv2 = uvs[uvc[:, 0]], uvs[uvc[:, 1]], uvs[uvc[:, 2]]

    if md.vertex_colors is not None:
        vidx = md.vtx_idx[order]
        vc = md.vertex_colors
        vc0, vc1, vc2 = (jnp.asarray(vc[vidx[:, 0]]),
                         jnp.asarray(vc[vidx[:, 1]]),
                         jnp.asarray(vc[vidx[:, 2]]))
    else:
        vc0 = vc1 = vc2 = None

    g = len(md.materials)
    g_kd = np.stack([m.kd for m in md.materials])
    g_ks = np.stack([m.ks for m in md.materials])
    g_ne = np.stack([m.ns for m in md.materials])

    # per-corner tangents for normal mapping (tangentSoup,
    # TriangleMesh.cpp:699-709)
    if md.tangents is not None:
        vidx = md.vtx_idx[order]
        t0 = md.tangents[vidx[:, 0]]
        t1 = md.tangents[vidx[:, 1]]
        t2 = md.tangents[vidx[:, 2]]
    else:
        t0 = t1 = t2 = np.zeros_like(n0)

    # texture images (MTL map_* refs resolved relative to the OBJ dir,
    # TriangleMesh.cpp:504-535)
    textures = []
    for m in md.materials:
        gt = tex_mod.GroupTextures()
        if load_textures:
            def resolve(name):
                if not name:
                    return None
                p = os.path.join(md.obj_dir, name.replace('\\', '/'))
                return p if os.path.exists(p) else None
            kd_p = resolve(m.map_kd)
            ks_p = resolve(m.map_ks)
            nm_p = resolve(m.map_bump)
            al_p = resolve(m.map_d)
            gt = tex_mod.GroupTextures(
                kd=None if kd_p is None else jnp.asarray(
                    tex_mod.load_color_image(kd_p)),
                ks=None if ks_p is None else jnp.asarray(
                    tex_mod.load_color_image(ks_p)),
                normal=None if nm_p is None else jnp.asarray(
                    tex_mod.load_normal_image(nm_p)),
                alpha=None if al_p is None else jnp.asarray(
                    tex_mod.load_color_image(al_p)),
            )
        textures.append(gt)

    # explicit per-group channel overrides (scene-JSON `textures` — the
    # reference's GUI texture slots incl. transp/refr/subsurface maps,
    # Geometry.h:399-445); dict applies to group 0, list is per group
    if texture_overrides:
        ov_list = ([texture_overrides] if isinstance(texture_overrides, dict)
                   else list(texture_overrides))
        for gi, ov in enumerate(ov_list[:g]):
            if not ov:
                continue
            new = tex_mod.make_group_textures(ov)
            merged = {ch: getattr(new, ch) if getattr(new, ch) is not None
                      else getattr(textures[gi], ch)
                      for ch in ('kd', 'ks', 'normal', 'alpha', 'roughness',
                                 'transp', 'refr', 'ksub')}
            textures[gi] = tex_mod.GroupTextures(**merged)

    # many-group meshes: pack each channel's images into one atlas so the
    # material fetch is one gather per channel, not a G-long select chain
    # (select chains win for small G — CLAUDE.md rule — so the atlas only
    # activates past ATLAS_MIN_GROUPS unless forced)
    if use_atlas is None:
        use_atlas = sum(gt.any_image for gt in textures) >= ATLAS_MIN_GROUPS
    if use_atlas and any(gt.any_image for gt in textures):
        atlases = tuple(
            tex_mod.build_atlas([getattr(gt, ch) for gt in textures])
            for ch in tex_mod.CHANNELS)
    else:
        atlases = ()

    if use_brute is None:
        use_brute = len(order) <= BRUTE_FORCE_MAX_TRIS

    # the Pallas packet kernel replaces the brute sweep on TPU for the
    # SMEM-resident tier (see ops/pallas_bvh.py); CPU keeps the dense path
    import jax
    use_packet = (len(order) <= PACKET_MAX_TRIS
                  and jax.default_backend() == 'tpu')
    if use_packet:
        from ..ops import pallas_bvh
        pk = pallas_bvh.pack_bvh(fb)
        packed = (pk.lox, pk.loy, pk.loz, pk.hix, pk.hiy, pk.hiz,
                  pk.na, pk.nb, pk.nleaf)
    else:
        packed = ()

    # the two-level cluster kernel is the TPU tier for EVERY mesh size
    # (round 3): with the hierarchical cull + lean sweep it measures
    # 22.4M rays/s on 1080p primaries at 2k tris vs 8.9M through the
    # SMEM packet kernel (and shadows get the cheap any-hit sweep).
    # CPU keeps the XLA lockstep bvh_hit.  The packet arrays are still
    # built below (explicit use_cluster=False keeps that tier testable).
    if use_cluster is None:
        use_cluster = jax.default_backend() == 'tpu'
    # backface-cull gate (see MeshArrays.backface_cull): material side —
    # the mesh must be opaque EVERYWHERE (no transparent/subsurface group
    # constants, no alpha/transp/refr/ksub texture channels: any of
    # those lets rays continue inside, where back faces are real hits);
    # geometric side — closed_orientation's welded directed-edge +
    # per-shell volume check (also yields the orientation sign baked
    # into the cluster normal bounds).  PT_NO_BACKFACE=1 disables for
    # triage/A-B.
    bf_sign = 0
    if (use_cluster and allow_backface
            and os.environ.get('PT_NO_BACKFACE') != '1'):
        transp_any = (bool(np.any(np.asarray(group_transp)))
                      if group_transp is not None else bool(default_transp))
        ksub_any = (bool(np.any(np.asarray(group_ksub) != 0.0))
                    if group_ksub is not None
                    else bool(np.any(np.asarray(default_ksub,
                                                np.float32) != 0.0)))
        tex_block = any(gt.alpha is not None or gt.transp is not None
                        or gt.refr is not None or gt.ksub is not None
                        for gt in textures)
        if not (transp_any or ksub_any or tex_block):
            from . import topology
            bf_sign = topology.closed_orientation(md.vertices, md.vtx_idx)
    if use_cluster:
        from ..ops import pallas_cluster
        cmesh = pallas_cluster.build_clustered(
            tri_verts, fb=fb, nrm_sign=float(bf_sign if bf_sign else 1))
        clustered = pallas_cluster.cluster_arrays(cmesh)
        n_clusters = cmesh.n_clusters
        cluster_top_max_leaf = cmesh.top_max_leaf
    else:
        clustered = ()
        n_clusters = 0
        cluster_top_max_leaf = 0

    # LEAN upload (VERDICT r03 #4): a dense-cull cluster-tier mesh never
    # touches soup/bvh at render time — two_level_hit leaves residual
    # identically False (no bvh_hit_sparse net), barycentrics ride the
    # shade_pack 'bary' columns, shading reads shade_pack rows, and the
    # subsurface reservoir marches through _mesh_closest_hit.  Dropping
    # the soup (12 (T,) arrays), the BVH and the duplicate per-corner
    # attribute arrays (all packed into shade_pack below) halves the
    # office-scale HBM footprint.  PACKET_MAX_TRIS gate: small meshes
    # keep every tier testable on-device (and cost nothing).
    if lean is None:
        lean = (bool(use_cluster) and not use_routed
                and len(order) > PACKET_MAX_TRIS
                and 0 < n_clusters <= pallas_cluster.DENSE_CULL_MAX
                and os.environ.get('PT_NO_LEAN') != '1')

    se = (jnp.asarray(md.show_edges[order]) if display_edges else None)
    if facecolors is not None:
        fc = np.asarray(facecolors, np.float32)
        assert fc.shape == (len(order), 3), 'facecolors must be (T,3)'
        fc = jnp.asarray(fc[order])
    else:
        fc = None

    # ---- packed per-triangle shading fetch (scene._shade_fetch) ----
    # Only the columns this mesh's feature set actually reads are packed;
    # the fetch is one (T, C) row gather instead of one gather per table.
    need_nm = (any(gt.normal is not None for gt in textures)
               or (atlases and atlases[tex_mod.CHANNELS.index('normal')]
                   is not None))
    textured = bool(atlases) or any(gt.any_image for gt in textures)
    parts, shade_cols, off = [], [], 0

    def _add(name, arr):
        nonlocal off
        a = np.asarray(arr, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        parts.append(a)
        shade_cols.append((name, off, a.shape[1]))
        off += a.shape[1]

    if interp_normals:
        _add('n0', n0), _add('n1', n1), _add('n2', n2)
    else:
        _add('fn', np.stack([host_soup.nx, host_soup.ny,
                             host_soup.nz], axis=-1))
    if g > 1 or group_rows is not None:
        _add('grp', np.asarray(md.group[order], np.int32)
             .view(np.float32))
    if textured:
        _add('uv0', uv0), _add('uv1', uv1), _add('uv2', uv2)
    if need_nm:
        _add('t0', t0), _add('t1', t1), _add('t2', t2)
    if vc0 is not None:
        _add('vc0', np.asarray(vc0)), _add('vc1', np.asarray(vc1))
        _add('vc2', np.asarray(vc2))
    if fc is not None:
        _add('fc', np.asarray(fc))
    if se is not None:
        _add('se', np.asarray(se, np.float32))
    if edge_colors is not None and display_edges:
        # per-edge CSV colors (TriMesh::load_edge_colors consumption,
        # TriangleMesh.cpp:991-1014): 9 color floats + 3 mask floats per
        # triangle, slot layout matching the bary crossing test
        ec_arr, em_arr = edge_colors
        _add('ec', np.asarray(ec_arr, np.float32)[order].reshape(-1, 9))
        _add('em', np.asarray(em_arr, np.float32)[order])
    if use_cluster:
        # edge-matrix rows for the per-ray barycentric recompute (the
        # lean cluster sweep returns (t, tri) winners only): packing them
        # HERE makes the whole bary+shading fetch ONE row gather — a
        # gather costs per ROW on TPU (~80ms per 2M-lane gather at 1080p
        # regardless of width), so a second per-bounce gather for the
        # bary table alone was as expensive as the whole shading fetch.
        ov = tri_verts[order].astype(np.float64)
        av_ = ov[:, 0]
        uv_ = ov[:, 1] - av_
        vv_ = ov[:, 2] - av_
        m11_ = (uv_ * uv_).sum(-1)
        m12_ = (uv_ * vv_).sum(-1)
        m22_ = (vv_ * vv_).sum(-1)
        det_ = m11_ * m22_ - m12_ * m12_
        inv_ = 1.0 / np.where(det_ != 0, det_, 1.0)
        _add('bary', np.concatenate(
            [av_, uv_, vv_, m11_[:, None], m12_[:, None], m22_[:, None],
             inv_[:, None]], axis=1).astype(np.float32))
    shade_pack = (jnp.asarray(np.concatenate(parts, axis=1))
                  if parts else None)

    if lean:
        # every render-time consumer reads shade_pack (asserted: the
        # packed columns cover what this mesh's feature set can touch)
        packed_names = {nm for nm, _, _ in shade_cols}
        assert 'bary' in packed_names
        assert ('n0' in packed_names if interp_normals
                else 'fn' in packed_names)
        soup = bvh = None
        vc0u = vc1u = vc2u = None
        n0u = n1u = n2u = t0u = t1u = t2u = None
        uv0u = uv1u = uv2u = None
        grpu = None
        se = fc = None
    else:
        soup = traverse.TriSoup(*[jnp.asarray(x) for x in host_soup])
        bvh = traverse.upload_bvh(fb)
        n0u, n1u, n2u = jnp.asarray(n0), jnp.asarray(n1), jnp.asarray(n2)
        uv0u, uv1u, uv2u = (jnp.asarray(uv0), jnp.asarray(uv1),
                            jnp.asarray(uv2))
        t0u, t1u, t2u = jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(t2)
        grpu = jnp.asarray(md.group[order], jnp.int32)
        vc0u, vc1u, vc2u = vc0, vc1, vc2

    return MeshArrays(
        soup=soup, bvh=bvh, packed=packed, use_packet=use_packet,
        atlases=atlases, bilinear=bool(bilinear),
        cutout_rounds=int(cutout_rounds), use_routed=bool(use_routed),
        show_edges=se, facecolors=fc, display_edges=bool(display_edges),
        clustered=clustered, use_cluster=bool(use_cluster),
        n_clusters=int(n_clusters),
        cluster_top_max_leaf=int(cluster_top_max_leaf),
        n0=n0u, n1=n1u, n2=n2u,
        uv0=uv0u, uv1=uv1u, uv2=uv2u,
        t0=t0u, t1=t1u, t2=t2u,
        textures=tuple(textures),
        group=grpu,
        vc0=vc0u, vc1=vc1u, vc2=vc2u,
        g_kd=jnp.asarray(g_kd), g_ks=jnp.asarray(g_ks),
        g_ne=jnp.asarray(g_ne),
        g_ksub=(jnp.asarray(group_ksub, jnp.float32)
                if group_ksub is not None else jnp.broadcast_to(
                    jnp.asarray(default_ksub, jnp.float32), (g, 3))),
        # object-level transp/refr seed every group (the reference's
        # per-Object fields, Geometry.h:418-433 defaults; MTL/texture
        # channels can override per group later); merged meshes pass
        # per-group arrays gathered from their source objects
        g_transp=(jnp.asarray(group_transp, bool) if group_transp
                  is not None else jnp.full((g,), bool(default_transp))),
        g_refr=(jnp.asarray(group_refr, jnp.float32) if group_refr
                is not None else jnp.full((g,), float(default_refr),
                                          jnp.float32)),
        group_rows=(None if group_rows is None
                    else jnp.asarray(group_rows, jnp.int32)),
        world_space=bool(world_space),
        shade_pack=shade_pack, shade_cols=tuple(shade_cols),
        obj_row=int(obj_row), max_leaf=int(fb.max_leaf),
        use_brute=bool(use_brute), interp_normals=bool(interp_normals),
        n_tris=len(order),
        backface_cull=bool(bf_sign != 0),
    )


def mergeable_spec(spec) -> bool:
    """Eligibility for the merged multi-mesh tier: features that need
    per-source-object state the merged path does not carry yet stay on
    the per-mesh path (vertex colors, seg overlays, wireframe,
    subsurface reservoirs)."""
    md = spec.mesh_data
    return (md is not None
            and md.vertex_colors is None
            and spec.seg_path is None
            and not spec.display_edges
            # a ghost inside a merged BVH would occlude behind-surfaces
            # on avoid_ghosts sweeps (closest hit returns the ghost and
            # the surface behind it is lost); per-mesh ghosts skip their
            # whole traversal instead, which is the correct semantics
            and not spec.ghost
            and spec.edge_csv is None
            and not np.any(np.broadcast_to(
                np.asarray(spec.ksub, np.float32), (3,)) != 0.0))


def merge_mesh_entries(entries):
    """Bake several mesh objects into ONE world-space MeshData.

    entries: list of (spec, row, trans (3,4) np, rot (3,3) np).
    Returns (MeshData, group_rows (G,) int32, per-group default dict,
    texture_overrides list) ready for upload_mesh(world_space=True).

    The reference reaches the same end through Embree instancing — each
    TriMesh is a sub-scene instanced with its 3x4 transform into one top
    scene (Geometry.cpp:255-277, 627-674).  On TPU an instance hierarchy
    would put a per-lane transform gather inside the traversal inner
    loop, so the transforms are baked into the soup instead and the
    per-object state (flags, rows) is recovered per GROUP at shading.
    Keyframed objects re-bake on every build_scene(frame=...) exactly
    like the reference's per-frame build_matrix."""
    verts, normals, uvs, tangents = [], [], [], []
    vtx_idx, n_idx, uv_idx, groups, show_edges = [], [], [], [], []
    materials, group_rows = [], []
    g_transp, g_refr, g_ksub, tex_ov = [], [], [], []
    v_base = n_base = uv_base = g_base = 0
    import dataclasses as dc
    import os

    for spec, row, trans, rot in entries:
        md = spec.mesh_data
        m3 = np.asarray(trans, np.float64)[:, :3]
        t3 = np.asarray(trans, np.float64)[:, 3]
        r3 = np.asarray(rot, np.float64)
        V = (md.vertices.astype(np.float64) @ m3.T + t3).astype(np.float32)
        t = md.vtx_idx.shape[0]
        verts.append(V)
        vtx_idx.append(md.vtx_idx + v_base)

        if spec.interp_normals and len(md.normals):
            N = (md.normals.astype(np.float64) @ r3.T).astype(np.float32)
            normals.append(N)
            n_idx.append(np.clip(md.n_idx, 0, len(md.normals) - 1)
                         + n_base)
            n_base += len(N)
        else:
            # face normals expanded per corner (flat shading baked in)
            fv = V[md.vtx_idx]
            fn = np.cross(fv[:, 1] - fv[:, 0], fv[:, 2] - fv[:, 0])
            ln = np.linalg.norm(fn, axis=-1, keepdims=True)
            fn = (fn / np.maximum(ln, 1e-20)).astype(np.float32)
            normals.append(fn)
            n_idx.append(np.repeat(np.arange(t, dtype=np.int32)[:, None],
                                   3, axis=1) + n_base)
            n_base += t

        if len(md.uvs):
            uvs.append(md.uvs)
            uv_idx.append(np.clip(md.uv_idx, 0, len(md.uvs) - 1)
                          + uv_base)
            uv_base += len(md.uvs)
        else:
            uvs.append(np.zeros((1, 2), np.float32))
            uv_idx.append(np.full((t, 3), uv_base, np.int32))
            uv_base += 1

        if md.tangents is not None:
            tangents.append((md.tangents.astype(np.float64)
                             @ r3.T).astype(np.float32))
        else:
            tangents.append(np.zeros_like(V))

        groups.append(md.group + g_base)
        show_edges.append(md.show_edges if md.show_edges is not None
                          else np.zeros((t, 3), bool))
        ng = len(md.materials)
        for m in md.materials:
            def absify(p):
                if not p:
                    return p
                q = p.replace('\\', '/')
                return q if os.path.isabs(q) else os.path.join(
                    md.obj_dir, q)
            materials.append(dc.replace(
                m, map_kd=absify(m.map_kd), map_ks=absify(m.map_ks),
                map_bump=absify(m.map_bump), map_d=absify(m.map_d)))
        group_rows.extend([row] * ng)
        g_transp.extend([bool(spec.transp)] * ng)
        g_refr.extend([float(spec.refr_index)] * ng)
        ks3 = np.broadcast_to(np.asarray(spec.ksub, np.float32), (3,))
        g_ksub.extend([ks3] * ng)
        ov = spec.textures
        ov_list = ([ov] if isinstance(ov, dict) else list(ov or []))
        ov_list = (ov_list + [None] * ng)[:ng]
        tex_ov.extend(ov_list)
        v_base += len(V)
        g_base += ng

    md_merged = obj_io.MeshData(
        vertices=np.concatenate(verts).astype(np.float32),
        normals=np.concatenate(normals).astype(np.float32),
        uvs=np.concatenate(uvs).astype(np.float32),
        vtx_idx=np.concatenate(vtx_idx).astype(np.int32),
        uv_idx=np.concatenate(uv_idx).astype(np.int32),
        n_idx=np.concatenate(n_idx).astype(np.int32),
        group=np.concatenate(groups).astype(np.int32),
        show_edges=np.concatenate(show_edges),
        vertex_colors=None,
        materials=materials,
        group_names={},
        tangents=np.concatenate(tangents).astype(np.float32),
        obj_dir='',
    )
    gdef = {'transp': np.asarray(g_transp, bool),
            'refr': np.asarray(g_refr, np.float32),
            'ksub': np.stack(g_ksub).astype(np.float32)}
    return (md_merged, np.asarray(group_rows, np.int32), gdef, tex_ov)
