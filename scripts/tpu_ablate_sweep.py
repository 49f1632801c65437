"""Ablate the sweep kernel's per-slot cost: DMA vs matmul vs epilogue.

Variants (same specs as the real kernel, garbage results where ablated):
  full      — the real kernel behavior
  no-dma    — process whatever is in the VMEM scratch (skip copy)
  no-mxu    — DMA, then run the epilogue on buf rows (skip the matmul)
  no-epi    — DMA + matmul, then only a min-reduce of raw prod
Run on the 512-packet tiled-topdown slice with counts clamped to 8.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.utils.profiling import device_sync
from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops.pallas_cluster import (
    BLOCK, MAXC, TRIS_C, SUBT, A_ROWS, BIG_T, build_clustered, cluster_cull)

print('devices:', jax.devices(), flush=True)

G = 708
xs = np.linspace(-20, 20, G + 1, dtype=np.float32)
X, Z = np.meshgrid(xs, xs, indexing='ij')
Y = 3.0 * np.sin(X * 0.6) * np.cos(Z * 0.5) + 1.2 * np.sin(X * 1.7 + 2.0)
V = np.stack([X, Y, Z], -1)
q00, q10, q01, q11 = V[:-1, :-1], V[1:, :-1], V[:-1, 1:], V[1:, 1:]
tris = np.concatenate([
    np.stack([q00, q10, q11], 2).reshape(-1, 3, 3),
    np.stack([q00, q11, q01], 2).reshape(-1, 3, 3)], 0).astype(np.float32)
cm = build_clustered(tris)
print('tris:', tris.shape[0], 'clusters:', cm.n_clusters, flush=True)

H, W = 1080, 1920
n = H * W
ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
cam = np.array([0.0, 60.0, 0.0], np.float32)
d = np.stack([(jj - W / 2) / W * 0.55,
              -np.ones_like(ii).astype(np.float32),
              (ii - H / 2) / H * 0.3], -1).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
TS = 32
Hc = (H // TS) * TS
d = (d[:Hc].reshape(Hc // TS, TS, W // TS, TS, 3)
     .transpose(0, 2, 1, 3, 4).reshape(-1, 3))
d = np.concatenate([d, d[:n - len(d)]], 0)
org_a = jnp.broadcast_to(jnp.asarray(cam), (n, 3))
dirn_a = jnp.asarray(d)
tmax_a = jnp.full((n,), 1e30, jnp.float32)

ids, count, keys = cluster_cull(cm, org_a, dirn_a, tmax_a)
nb = 512
m = nb * BLOCK
ids = ids[:nb]
count = jnp.minimum(count[:nb], 8)
keys = jnp.zeros_like(keys[:nb])
org, dirn, tmax = org_a[:m], dirn_a[:m], tmax_a[:m]
tmin = jnp.full((m,), -1.0, jnp.float32)


def make_kernel(variant):
    def kern(ids_ref, cnt_ref, keys_ref, packed_hbm,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tx_ref, tn_ref,
             tout_ref, triout_ref, alout_ref, beout_ref,
             buf0, sem):
        b = pl.program_id(0)
        cnt = jnp.minimum(cnt_ref[b, 0], MAXC)
        n_sub = TRIS_C // SUBT
        tail0 = n_sub * 6 * SUBT
        tout_ref[0, 0, :] = tx_ref[0, 0, :]
        triout_ref[0, 0, :] = jnp.full((BLOCK,), -1, jnp.int32)
        alout_ref[0, 0, :] = jnp.ones((BLOCK,), jnp.float32)
        beout_ref[0, 0, :] = jnp.zeros((BLOCK,), jnp.float32)
        ox = ox_ref[0, 0, :]
        oy = oy_ref[0, 0, :]
        oz = oz_ref[0, 0, :]
        tn = tn_ref[0, 0, :]

        def loop(k):
            cid = jnp.maximum(ids_ref[b, k], 0)
            if variant != 'no-dma':
                copy = pltpu.make_async_copy(packed_hbm.at[cid], buf0, sem)
                copy.start()
                copy.wait()
            c_x = jnp.min(buf0[0, tail0 + 128:tail0 + 256])
            c_y = jnp.min(buf0[1, tail0 + 128:tail0 + 256])
            c_z = jnp.min(buf0[2, tail0 + 128:tail0 + 256])
            rt = jnp.concatenate(
                [(ox - c_x)[None, :], (oy - c_y)[None, :],
                 (oz - c_z)[None, :], jnp.ones((1, BLOCK), jnp.float32),
                 dx_ref[0], dy_ref[0], dz_ref[0],
                 jnp.zeros((1, BLOCK), jnp.float32)], axis=0)

            def sub_body(s, _):
                off = pl.multiple_of(s * (6 * SUBT), 6 * SUBT)
                amat = buf0[:, pl.ds(off, 6 * SUBT)]
                if variant == 'no-mxu':
                    prod = jnp.broadcast_to(
                        amat[0:1, :] + amat[1:2, :], (BLOCK, 6 * SUBT))
                else:
                    prec = (jax.lax.Precision.HIGH if 'high' in variant
                            else jax.lax.Precision.HIGHEST)
                    prod = jax.lax.dot_general(
                        rt, amat, (((0,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32)
                if variant == 'no-epi':
                    tj = jnp.min(prod[:, 0:SUBT], axis=-1)
                    win = tj < tout_ref[0, 0, :]
                    tout_ref[0, 0, :] = jnp.where(win, tj,
                                                  tout_ref[0, 0, :])
                    return 0
                if variant == 'tonly':
                    t = -(prod[:, 0:SUBT] / prod[:, 3*SUBT:4*SUBT])
                    tj = jnp.min(t, axis=-1)
                    win = tj < tout_ref[0, 0, :]
                    tout_ref[0, 0, :] = jnp.where(win, tj,
                                                  tout_ref[0, 0, :])
                    return 0
                if variant == 'acc-only':
                    on = prod[:, 0 * SUBT:1 * SUBT]
                    oU = prod[:, 1 * SUBT:2 * SUBT]
                    oV = prod[:, 2 * SUBT:3 * SUBT]
                    dn = prod[:, 3 * SUBT:4 * SUBT]
                    dU = prod[:, 4 * SUBT:5 * SUBT]
                    dV = prod[:, 5 * SUBT:6 * SUBT]
                    t = -(on / dn)
                    beta = oU + t * dU
                    gamma = oV + t * dV
                    ok = ((t >= 0.0) & (t > tn[:, None]) & (beta >= 0.0)
                          & (gamma >= 0.0) & (beta + gamma <= 1.0))
                    t = jnp.where(ok, t, BIG_T)
                    tj = jnp.min(t, axis=-1)
                    win = tj < tout_ref[0, 0, :]
                    tout_ref[0, 0, :] = jnp.where(win, tj,
                                                  tout_ref[0, 0, :])
                    return 0
                on = prod[:, 0 * SUBT:1 * SUBT]
                oU = prod[:, 1 * SUBT:2 * SUBT]
                oV = prod[:, 2 * SUBT:3 * SUBT]
                dn = prod[:, 3 * SUBT:4 * SUBT]
                dU = prod[:, 4 * SUBT:5 * SUBT]
                dV = prod[:, 5 * SUBT:6 * SUBT]
                t = -(on / dn)
                beta = oU + t * dU
                gamma = oV + t * dV
                if variant == 'lean':
                    bary = jnp.minimum(jnp.minimum(beta, gamma),
                                       1.0 - (beta + gamma))
                    ok = (t >= 0.0) & (t > tn[:, None]) & (bary >= 0.0)
                else:
                    ok = ((t >= 0.0) & (t > tn[:, None]) & (beta >= 0.0)
                          & (gamma >= 0.0) & (beta + gamma <= 1.0))
                t = jnp.where(ok, t, BIG_T)
                lane_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (BLOCK, SUBT), 1)
                if variant == 'lean':
                    # packed-key winner + exact-t onehot on the already
                    # masked t; beta/gamma sums dropped (recomputed
                    # outside the kernel per-ray)
                    tl = t
                    key = ((jax.lax.bitcast_convert_type(tl, jnp.int32)
                            & ~jnp.int32(0xFF)) | lane_iota)
                    kmin = jnp.min(key, axis=-1)
                    j = kmin & jnp.int32(0xFF)
                    onehot = lane_iota == j[:, None]
                    tj = jnp.sum(jnp.where(onehot, tl, 0.0), axis=-1)
                    win = tj < tout_ref[0, 0, :]
                    tout_ref[0, 0, :] = jnp.where(win, tj, tout_ref[0, 0, :])
                    triout_ref[0, 0, :] = jnp.where(
                        win, cid * TRIS_C + s * SUBT + j,
                        triout_ref[0, 0, :])
                    return 0
                if variant == 'notb':
                    # winner (t, tri) only: packed-key single reduction,
                    # beta/gamma recomputed per-RAY outside the kernel
                    key = ((jax.lax.bitcast_convert_type(t, jnp.int32)
                            & ~jnp.int32(0xFF)) | lane_iota)
                    kmin = jnp.min(key, axis=-1)
                    tj = jax.lax.bitcast_convert_type(
                        kmin & ~jnp.int32(0xFF), jnp.float32)
                    win = tj < tout_ref[0, 0, :]
                    j = kmin & jnp.int32(0xFF)
                    tout_ref[0, 0, :] = jnp.where(win, tj, tout_ref[0, 0, :])
                    triout_ref[0, 0, :] = jnp.where(
                        win, cid * TRIS_C + s * SUBT + j,
                        triout_ref[0, 0, :])
                    return 0
                if 'pk' in variant:
                    # packed-key winner: ONE min-reduce picks (truncated
                    # t, index); exact t/beta/gamma via onehot sums
                    key = ((jax.lax.bitcast_convert_type(t, jnp.int32)
                            & ~jnp.int32(0xFF)) | lane_iota)
                    kmin = jnp.min(key, axis=-1)
                    j = kmin & jnp.int32(0xFF)
                    onehot = lane_iota == j[:, None]
                    tj = jnp.sum(jnp.where(onehot, t, 0.0), axis=-1)
                else:
                    tj = jnp.min(t, axis=-1)
                    is_win = t <= tj[:, None]
                    j = jnp.min(jnp.where(is_win, lane_iota, SUBT), axis=-1)
                    onehot = lane_iota == j[:, None]
                be_j = jnp.sum(jnp.where(onehot, beta, 0.0), axis=-1)
                ga_j = jnp.sum(jnp.where(onehot, gamma, 0.0), axis=-1)
                win = tj < tout_ref[0, 0, :]
                tout_ref[0, 0, :] = jnp.where(win, tj, tout_ref[0, 0, :])
                triout_ref[0, 0, :] = jnp.where(
                    win, cid * TRIS_C + s * SUBT + j, triout_ref[0, 0, :])
                alout_ref[0, 0, :] = jnp.where(win, 1.0 - be_j - ga_j,
                                               alout_ref[0, 0, :])
                beout_ref[0, 0, :] = jnp.where(win, be_j,
                                               beout_ref[0, 0, :])
                return 0

            jax.lax.fori_loop(0, n_sub, sub_body, jnp.int32(0))
            return k + 1

        jax.lax.while_loop(lambda k: k < cnt, loop, jnp.int32(0))
    return kern


def run(variant):
    width = cm.packed.shape[2]
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    row = pl.BlockSpec((1, 1, BLOCK), lambda b, i, c, k: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(nb,),
        in_specs=[hbm] + [row] * 8, out_specs=[row] * 4,
        scratch_shapes=[pltpu.VMEM((A_ROWS, width), jnp.float32),
                        pltpu.SemaphoreType.DMA])
    plane = lambda x: x.reshape(nb, 1, BLOCK)
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(variant), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.int32),
                   jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)])(*a))
    args = (ids, count, keys, cm.packed,
            plane(org[:, 0]), plane(org[:, 1]), plane(org[:, 2]),
            plane(dirn[:, 0]), plane(dirn[:, 1]), plane(dirn[:, 2]),
            plane(tmax), plane(tmin))
    out = f(*args)
    device_sync(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    dt = best
    slots = int(np.asarray(jnp.minimum(count, MAXC)).sum())
    hits = float((np.asarray(out[0]) < 1e29).mean())
    print(f'{variant:8s}: {dt*1e3:7.1f}ms  ({dt/slots*1e6:.1f}us/slot '
          f'incl. fixed)  hitfrac={hits:.3f}', flush=True)


for v in ('full', 'lean', 'full', 'lean'):
    run(v)

