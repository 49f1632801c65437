"""Prototype: does a small-K jnp.dot inside a Pallas TPU kernel hit the MXU
and beat the elementwise VPU formulation?  Times both variants of a dense
ray x tri "sides" computation at the sweep kernel's shapes.
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024
SUBT = 256
NS = 3 * SUBT      # n / U' / V' planes side by side

REPS = 64          # inner loop to swamp dispatch


def mxu_kernel(rays_ref, tris_ref, out_ref):
    acc = jnp.zeros((BLOCK, NS), jnp.float32)
    def body(i, acc):
        r = rays_ref[...] + i.astype(jnp.float32) * 1e-7
        prod = jnp.dot(r, tris_ref[...], preferred_element_type=jnp.float32)
        return acc + prod
    acc = jax.lax.fori_loop(0, REPS, body, acc)
    out_ref[...] = acc


def vpu_kernel(rays_ref, tris_ref, out_ref):
    acc = jnp.zeros((BLOCK, NS), jnp.float32)
    def body(i, acc):
        r = rays_ref[...] + i.astype(jnp.float32) * 1e-7
        s = jnp.zeros((BLOCK, NS), jnp.float32)
        for k in range(8):
            s = s + r[:, k][:, None] * tris_ref[k, :][None, :]
        return acc + s
    acc = jax.lax.fori_loop(0, REPS, body, acc)
    out_ref[...] = acc


def run(kernel, name):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BLOCK, NS), jnp.float32),
    )
    f = jax.jit(f)
    rays = jnp.asarray(np.random.randn(BLOCK, 8).astype(np.float32))
    tris = jnp.asarray(np.random.randn(8, NS).astype(np.float32))
    out = f(rays, tris)
    out.block_until_ready()
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        out = f(rays, tris)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / N / REPS
    flops = 2 * BLOCK * NS * 8
    print(f'{name}: {dt*1e6:.2f}us per (1024x8)x(8x{NS}) '
          f'-> {flops/dt/1e12:.2f} TFLOP/s', flush=True)
    return out


if __name__ == '__main__':
    print('devices:', jax.devices(), flush=True)
    a = run(mxu_kernel, 'mxu jnp.dot')
    b = run(vpu_kernel, 'vpu unrolled')
    print('max diff', float(jnp.abs(a - b).max()))
