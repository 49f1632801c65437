"""Micro-bench: octant-sort machinery alternatives at wavefront scale.

The e2e wave profile shows ~0.8s in two argsort while-loops + ~0.8s in
~18 per-array permutation gathers (45ms each!) out of 4.3s device time.
Candidates measured here on the real chip at N = 1080p lanes:
  1. jnp.argsort(key, stable)            (current)
  2. counting sort over the 9 octant buckets (cumsum + scatter)
  3. permutation apply: 18 separate gathers vs ONE packed (N,64) gather
"""

import sys; sys.path.insert(0, '/root/repo')  # noqa: E402
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1920 * 1080


def bench(f, *args, reps=10, warm=2):
    for _ in range(warm):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 9, N).astype(np.int32))

# -- 1. argsort --------------------------------------------------------
argsort = jax.jit(lambda k: jnp.argsort(k, stable=True))
t = bench(argsort, key)
print(f'argsort(stable) 2M i32:          {t*1e3:8.2f} ms', flush=True)


# -- 2. counting sort ---------------------------------------------------
@jax.jit
def counting_perm(k):
    nb = 9
    onehot = (k[:, None] == jnp.arange(nb, dtype=k.dtype)).astype(jnp.int32)
    within = jnp.cumsum(onehot, axis=0)              # inclusive prefix
    counts = within[-1]
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1]])
    dest = base[k] + jnp.take_along_axis(
        within, k[:, None], axis=1)[:, 0] - 1
    return jnp.zeros(k.shape[0], jnp.int32).at[dest].set(
        jnp.arange(k.shape[0], dtype=jnp.int32))


t = bench(counting_perm, key)
print(f'counting sort (cumsum+scatter):  {t*1e3:8.2f} ms', flush=True)
pa = np.asarray(argsort(key))
pc = np.asarray(counting_perm(key))
print('perms identical:', (pa == pc).all(), flush=True)

# -- 3. permutation application ----------------------------------------
perm = jnp.asarray(pa)
arrs3 = [jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
         for _ in range(12)]
arrs1 = [jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
         for _ in range(6)]


@jax.jit
def apply_separate(perm, a3, a1):
    return ([x[perm] for x in a3], [x[perm] for x in a1])


t = bench(apply_separate, perm, arrs3, arrs1)
print(f'apply perm, 18 separate gathers: {t*1e3:8.2f} ms', flush=True)

packed = jnp.concatenate([jnp.concatenate(arrs3, 1)] +
                         [x[:, None] for x in arrs1], 1)   # (N,42)
print('packed shape:', packed.shape, flush=True)


@jax.jit
def apply_packed(perm, p):
    return p[perm]


t = bench(apply_packed, perm, packed)
print(f'apply perm, one (N,42) gather:   {t*1e3:8.2f} ms', flush=True)

pad = jnp.concatenate([packed, jnp.zeros((N, 22), jnp.float32)], 1)  # (N,64)
t = bench(apply_packed, perm, pad)
print(f'apply perm, one (N,64) gather:   {t*1e3:8.2f} ms', flush=True)

# -- 4. inverse perm: argsort vs scatter --------------------------------
inv_a = jax.jit(lambda p: jnp.argsort(p))
inv_s = jax.jit(lambda p: jnp.zeros(p.shape[0], jnp.int32).at[p].set(
    jnp.arange(p.shape[0], dtype=jnp.int32)))
t = bench(inv_a, perm)
print(f'inverse perm via argsort:        {t*1e3:8.2f} ms', flush=True)
t = bench(inv_s, perm)
print(f'inverse perm via scatter:        {t*1e3:8.2f} ms', flush=True)
print('inv identical:', (np.asarray(inv_a(perm)) == np.asarray(inv_s(perm))).all())
