"""Component-cost microbench of the cluster sweep at production shapes.

Times, per (BLOCK x SUBT) subtile on the real chip:
  * the (BLOCK,8)x(8,6*SUBT) matmul at DEFAULT / HIGH / HIGHEST
  * the VPU epilogue alone (t/beta/gamma + acceptance + winner extract)
  * the VPU edge-matrix formulation (old kernel style) for comparison
Each kernel runs REPS iterations of ONE subtile so dispatch amortizes.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK, SUBT, AR = 1024, 256, 8
NS = 6 * SUBT
REPS = 256
BIG_T = np.float32(1e30)


def time_kernel(kernel, inputs, out_shape, name, work_desc):
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCK, 128), jnp.float32)
        if out_shape is None else out_shape))
    out = f(*inputs)
    out.block_until_ready()
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = f(*inputs)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / N / REPS
    print(f'{name}: {dt*1e6:.2f}us per subtile ({work_desc})', flush=True)
    return dt


def matmul_kernel(prec):
    def k(r_ref, a_ref, o_ref):
        acc = jnp.zeros((BLOCK, 128), jnp.float32)
        def body(i, acc):
            r = r_ref[...] + i.astype(jnp.float32) * 1e-9
            prod = jnp.dot(r, a_ref[...], precision=prec,
                           preferred_element_type=jnp.float32)
            return acc + prod[:, :128]      # keep the live set small
        o_ref[...] = jax.lax.fori_loop(0, REPS, body, acc)
    return k


def epilogue_kernel(p_ref, tn_ref, o_ref):
    """Everything after the matmul: 6-way split, t/beta/gamma, acceptance,
    per-lane winner extraction, best-t update."""
    tn = tn_ref[0, :]
    def body(i, carry):
        tbest, tri = carry
        prod = p_ref[...] + i.astype(jnp.float32) * 1e-9
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
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, SUBT), 1)
        is_win = t <= tj[:, None]
        j = jnp.min(jnp.where(is_win, lane_iota, SUBT), axis=-1)
        win = tj < tbest
        return (jnp.where(win, tj, tbest),
                jnp.where(win, j, tri))
    tbest, tri = jax.lax.fori_loop(
        0, REPS, body,
        (jnp.full((BLOCK,), BIG_T), jnp.zeros((BLOCK,), jnp.int32)))
    o_ref[...] = jnp.stack([tbest, tri.astype(jnp.float32)], axis=0)


def edgemat_kernel(o_ref_, d_ref_, tr_ref, out_ref):
    """Old-style per-pair VPU test: 9 broadcast mults + adds per component
    (edge-matrix form, ~45 ops/pair)."""
    ox = o_ref_[0, :][:, None]; oy = o_ref_[1, :][:, None]
    oz = o_ref_[2, :][:, None]
    dx = d_ref_[0, :][:, None]; dy = d_ref_[1, :][:, None]
    dz = d_ref_[2, :][:, None]
    def body(i, tbest):
        tr = tr_ref[...] + i.astype(jnp.float32) * 1e-9
        ax, ay, az = tr[0, :], tr[1, :], tr[2, :]
        nx, ny, nz = tr[3, :], tr[4, :], tr[5, :]
        ux, uy, uz = tr[6, :], tr[7, :], tr[8, :]
        vx, vy, vz = tr[9, :], tr[10, :], tr[11, :]
        dn = dx * nx[None, :] + dy * ny[None, :] + dz * nz[None, :]
        on = ((ox - ax[None, :]) * nx[None, :]
              + (oy - ay[None, :]) * ny[None, :]
              + (oz - az[None, :]) * nz[None, :])
        t = -(on / dn)
        px = ox + t * dx - ax[None, :]
        py = oy + t * dy - ay[None, :]
        pz = oz + t * dz - az[None, :]
        beta = px * ux[None, :] + py * uy[None, :] + pz * uz[None, :]
        gamma = px * vx[None, :] + py * vy[None, :] + pz * vz[None, :]
        ok = ((t >= 0.0) & (beta >= 0.0) & (gamma >= 0.0)
              & (beta + gamma <= 1.0))
        t = jnp.where(ok, t, BIG_T)
        return jnp.minimum(tbest, jnp.min(t, axis=-1))
    tbest = jax.lax.fori_loop(0, REPS, body, jnp.full((BLOCK,), BIG_T))
    out_ref[...] = tbest[None, :]


if __name__ == '__main__':
    print('devices:', jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((BLOCK, AR)).astype(np.float32))
    a = jnp.asarray(rng.standard_normal((AR, NS)).astype(np.float32))
    for prec in (jax.lax.Precision.DEFAULT,
                 jax.lax.Precision.HIGHEST):
        time_kernel(matmul_kernel(prec),
                    (r, a), None,
                    f'matmul {prec}', f'(1024x8)x(8x{NS})')
    p = jnp.asarray(rng.standard_normal((BLOCK, NS)).astype(np.float32))
    tn = jnp.zeros((1, BLOCK), jnp.float32)
    time_kernel(epilogue_kernel, (p, tn),
                jax.ShapeDtypeStruct((2, BLOCK), jnp.float32),
                'epilogue', f'{SUBT} tris x {BLOCK} rays')
    ov = jnp.asarray(rng.standard_normal((3, BLOCK)).astype(np.float32))
    dv = jnp.asarray(rng.standard_normal((3, BLOCK)).astype(np.float32))
    tr = jnp.asarray(rng.standard_normal((12, SUBT)).astype(np.float32))
    time_kernel(edgemat_kernel, (ov, dv, tr),
                jax.ShapeDtypeStruct((1, BLOCK), jnp.float32),
                'edge-matrix VPU', f'{SUBT} tris x {BLOCK} rays')
