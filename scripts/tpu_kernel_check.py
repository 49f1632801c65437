"""On-device Pallas-kernel regression net (VERDICT #10).

One command, run each round on the real chip:

    timeout 900 python scripts/tpu_kernel_check.py

Asserts bit-level agreement of every Pallas traversal tier against the
dense brute-force oracle ON THE SAME DEVICE and writes KERNEL_CHECK.json
at the repo root so a Mosaic/compiler regression cannot ship silently
(CI runs the same comparisons in interpret mode only — tests/conftest.py
forces CPU).

Checks:
  packet    — SMEM packet kernel (ops/pallas_bvh.packet_hit) vs brute.
  cluster   — two-level cluster kernel (coherent camera-style rays).
  incoher   — cluster kernel under incoherent random rays (stresses the
              cull top-k + refine path; forces some overflow packets).
  subtile   — a thin-silhouette view where most subtiles should be
              culled; bit-exactness proves the skip is sound.

Run under `timeout`; if the device wedges kill the exact PID and
health-check with a matmul (CLAUDE.md wedge recovery).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from pathtracer_tpu.utils.profiling import device_sync  # noqa: E402

from pathtracer_tpu.ops import bvh as bvh_mod
from pathtracer_tpu.ops import pallas_bvh as pb
from pathtracer_tpu.ops import pallas_cluster as pc
from pathtracer_tpu.ops.traverse import brute_force_hit, make_soup

OUT = '/root/repo/KERNEL_CHECK.json'
results = {}


def log(*a):
    print(*a, flush=True)


def terrain(g, seed=0, amp=3.0):
    xs = np.linspace(-20, 20, g + 1, dtype=np.float32)
    X, Z = np.meshgrid(xs, xs, indexing='ij')
    Y = amp * np.sin(X * 0.6) * np.cos(Z * 0.5) \
        + 1.2 * np.sin(X * 1.7 + seed)
    V = np.stack([X, Y, Z], -1)
    q00, q10, q01, q11 = V[:-1, :-1], V[1:, :-1], V[:-1, 1:], V[1:, 1:]
    return np.concatenate([
        np.stack([q00, q10, q11], 2).reshape(-1, 3, 3),
        np.stack([q00, q11, q01], 2).reshape(-1, 3, 3)], 0)


def camera_rays(n, origin, pitch=-0.9, seed=1):
    rng = np.random.default_rng(seed)
    org = np.asarray(origin, np.float32)[None, :] \
        + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] += pitch * 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def compare(name, t, tri, al, t_ref, tri_ref, al_ref, tol=1e-3):
    t = np.asarray(t)
    t_ref = np.asarray(t_ref)
    hit = t_ref < 1e29
    dt = float(np.abs(t - t_ref).max())
    trim = float((np.asarray(tri) == np.asarray(tri_ref)).mean())
    dal = float(np.abs(np.asarray(al) - np.asarray(al_ref))[hit].max()
                if hit.any() else 0.0)
    ok = dt < tol and dal < tol
    results[name] = {'hit_fraction': float(hit.mean()), 'max_dt': dt,
                     'tri_match': trim, 'max_dalpha': dal, 'ok': ok}
    log(f'[{name}] hits {hit.mean():.3f} max|dt| {dt:.2e} '
        f'tri-match {trim:.4f} max|dal| {dal:.2e} -> '
        f'{"OK" if ok else "FAIL"}')
    return ok


def check_packet():
    tris = terrain(49)                       # 4802 tris (SMEM tier)
    fb = bvh_mod.build_bvh(tris)
    soup = make_soup(tris[fb.order])
    pk = pb.pack_bvh(fb)
    org, dirn = camera_rays(2 * pb.BLOCK, (0.0, 25.0, 30.0))
    tmax = jnp.full((org.shape[0],), 1e30, jnp.float32)
    t0 = time.perf_counter()
    t, tri, al, be = pb.packet_hit_packed(pk, soup, org, dirn, tmax)
    device_sync(t)
    log(f'packet kernel {time.perf_counter() - t0:.1f}s')
    ref = brute_force_hit(soup, org, dirn)
    return compare('packet', t, tri, al, ref.t, ref.tri, ref.alpha)


def check_cluster(name, rays_fn, tris_c=None, seed=0):
    tris = terrain(316, seed=seed)           # ~200k tris (cluster tier)
    cm = pc.build_clustered(tris, tris_c=tris_c)
    org, dirn = rays_fn()
    n = org.shape[0]
    tmax = jnp.full((n,), 1e30, jnp.float32)
    t0 = time.perf_counter()
    # return_residual mirrors the product path (scene/mesh.py): lanes the
    # overflow refinement cannot prove exact are REROUTED to the lockstep
    # BVH there, so the exactness contract covers non-residual lanes; the
    # check reroutes the same way (host-side brute on those lanes)
    t, tri, al, be, res = pc.two_level_hit(cm, org, dirn, tmax,
                                           return_residual=True)
    device_sync(t)
    res = np.asarray(res)
    log(f'{name} kernel {time.perf_counter() - t0:.1f}s '
        f'({cm.n_clusters} clusters, residual {res.sum()}/{n})')
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    t = np.asarray(t).copy()
    tri = np.asarray(tri).copy()
    al = np.asarray(al).copy()
    t[res] = np.asarray(ref.t)[res]
    tri[res] = np.asarray(ref.tri)[res]
    al[res] = np.asarray(ref.alpha)[res]
    results[f'{name}_residual_fraction'] = float(res.mean())
    return compare(name, t, tri, al, ref.t, ref.tri, ref.alpha)


def main():
    log('devices:', jax.devices())
    ok = check_packet()

    ok &= check_cluster(
        'cluster', lambda: camera_rays(2 * pc.BLOCK, (0.0, 25.0, 30.0)))

    def incoherent():
        rng = np.random.default_rng(7)
        org = rng.uniform(-25, 25, (2 * pc.BLOCK, 3)).astype(np.float32)
        org[:, 1] = rng.uniform(5, 30, 2 * pc.BLOCK)
        d = rng.normal(size=(2 * pc.BLOCK, 3)).astype(np.float32)
        d[:, 1] -= 0.8
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(org), jnp.asarray(d)

    ok &= check_cluster('incoher', incoherent, seed=3)

    def grazing():
        rng = np.random.default_rng(9)
        org = np.array([0.0, 4.5, 21.0], np.float32)[None, :] \
            + rng.normal(0, 0.2, (2 * pc.BLOCK, 3)).astype(np.float32)
        d = rng.normal(size=(2 * pc.BLOCK, 3)).astype(np.float32)
        d[:, 1] = -np.abs(d[:, 1]) * 0.08 - 0.02
        d[:, 2] -= 1.5
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(org), jnp.asarray(d)

    ok &= check_cluster('subtile', grazing, tris_c=1024, seed=5)

    # any-hit (occlusion) kernel vs brute: exact away from t==limit
    # f32 boundaries (shadow-sweep product path, scene.intersect_shadow)
    tris = terrain(316, seed=3)
    cm = pc.build_clustered(tris)
    org, dirn = incoherent()
    rng = np.random.default_rng(11)
    limit = jnp.asarray(rng.uniform(3.0, 60.0,
                                    (org.shape[0],)).astype(np.float32))
    t0 = time.perf_counter()
    occ = pc.two_level_any(cm, org, dirn, limit)
    occ = np.asarray(occ)
    log(f'anyhit kernel {time.perf_counter() - t0:.1f}s')
    ref = brute_force_hit(pc.flat_soup(cm), org, dirn)
    expect = np.asarray(ref.t) < np.asarray(limit)
    near = np.isclose(np.asarray(ref.t), np.asarray(limit), rtol=1e-5)
    mism = float(((occ != expect) & ~near).mean())
    a_ok = mism == 0.0
    results['anyhit'] = {'occluded_fraction': float(occ.mean()),
                         'mismatch_fraction': mism, 'ok': a_ok}
    log(f'[anyhit] occluded {occ.mean():.3f} mismatch {mism:.2e} -> '
        f'{"OK" if a_ok else "FAIL"}')
    ok &= a_ok

    results['all_ok'] = bool(ok)
    results['device'] = str(jax.devices()[0])
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=1)
    log('wrote', OUT, '->', 'ALL OK' if ok else 'FAILURES')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()

