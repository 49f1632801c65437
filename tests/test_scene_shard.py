"""Scene-sharded intersection on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pathtracer_tpu.ops import traverse
from pathtracer_tpu.parallel import scene_shard


def test_sharded_hit_matches_single_device():
    rng = np.random.default_rng(0)
    t = 1000
    base = rng.uniform(-4, 4, (t, 1, 3))
    tri = (base + rng.uniform(-0.4, 0.4, (t, 3, 3))).astype(np.float32)

    n = 512
    org = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ('scene',))
    sm = scene_shard.partition_mesh(tri, 8)
    hit_fn = scene_shard.make_sharded_hit(mesh)
    t_sh, gtri = hit_fn(sm.soup, sm.valid, sm.tri_base, org, d)

    # single-device reference over the same global order
    soup = traverse.make_soup(tri[sm.order])
    brute = traverse.brute_force_hit(soup, org, d)

    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(brute.t),
                               rtol=1e-5)
    hit = np.asarray(brute.t) < 1e29
    assert hit.sum() > 30
    same = np.asarray(gtri)[hit] == np.asarray(brute.tri)[hit]
    assert same.mean() > 0.99


def test_routed_bvh_hit_matches_broadcast_100k():
    # VERDICT #5 done-criterion: the routed sub-BVH path produces
    # identical hits to broadcast-combine on a >=100k-tri mesh across 8
    # virtual devices
    rng = np.random.default_rng(1)
    t = 100_000
    base = rng.uniform(-10, 10, (t, 1, 3))
    tri = (base + rng.uniform(-0.15, 0.15, (t, 3, 3))).astype(np.float32)

    n = 2048
    org = jnp.asarray(rng.uniform(-14, 14, (n, 3)).astype(np.float32))
    d = -np.asarray(org) + rng.normal(0, 2, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ('scene',))

    sm2 = scene_shard.partition_mesh_bvh(tri, 8)
    routed = scene_shard.make_routed_hit(mesh, max_leaf=sm2.max_leaf,
                                         block=1024)
    t_r, g_r = routed(sm2, org, d)

    # oracle: single-device brute over the v2 global order
    soup = traverse.make_soup(tri[sm2.order])
    brute = traverse.brute_force_hit(soup, org, d)

    np.testing.assert_allclose(np.asarray(t_r), np.asarray(brute.t),
                               rtol=1e-4)
    hit = np.asarray(brute.t) < 1e29
    assert hit.sum() > 500, "vacuous: too few hits"
    same = np.asarray(g_r)[hit] == np.asarray(brute.tri)[hit]
    assert same.mean() > 0.99


def test_routed_hit_partition_scaling():
    # the same rays produce the same hits at 2, 4, 8 partitions
    rng = np.random.default_rng(2)
    t = 20_000
    base = rng.uniform(-8, 8, (t, 1, 3))
    tri = (base + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    n = 1024
    org = jnp.asarray(rng.uniform(-12, 12, (n, 3)).astype(np.float32))
    d = -np.asarray(org) + rng.normal(0, 2, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    devs = jax.devices()
    ts = {}
    for k in (2, 4, 8):
        mesh = Mesh(np.array(devs[:k]), ('scene',))
        sm2 = scene_shard.partition_mesh_bvh(tri, k)
        routed = scene_shard.make_routed_hit(mesh, max_leaf=sm2.max_leaf,
                                             block=512)
        t_r, _ = routed(sm2, org, d)
        ts[k] = np.asarray(t_r)
    np.testing.assert_allclose(ts[2], ts[4], rtol=1e-4)
    np.testing.assert_allclose(ts[4], ts[8], rtol=1e-4)


def test_ring_hit_matches_oracle_100k():
    # ring-pipelined form (rays AND geometry sharded 1/D) must produce
    # the same closest hits as the single-device oracle
    rng = np.random.default_rng(3)
    t = 100_000
    base = rng.uniform(-10, 10, (t, 1, 3))
    tri = (base + rng.uniform(-0.15, 0.15, (t, 3, 3))).astype(np.float32)

    n = 2048
    org = jnp.asarray(rng.uniform(-14, 14, (n, 3)).astype(np.float32))
    d = -np.asarray(org) + rng.normal(0, 2, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ('scene',))
    sm2 = scene_shard.partition_mesh_bvh(tri, 8)
    ring = scene_shard.make_ring_hit(mesh, max_leaf=sm2.max_leaf)
    t_r, g_r = ring(sm2, org, d)

    soup = traverse.make_soup(tri[sm2.order])
    brute = traverse.brute_force_hit(soup, org, d)

    np.testing.assert_allclose(np.asarray(t_r), np.asarray(brute.t),
                               rtol=1e-4)
    hit = np.asarray(brute.t) < 1e29
    assert hit.sum() > 500, "vacuous: too few hits"
    same = np.asarray(g_r)[hit] == np.asarray(brute.tri)[hit]
    assert same.mean() > 0.99


def test_ring_hit_unpadded_ray_count():
    # N not divisible by D exercises the pad/strip path
    rng = np.random.default_rng(4)
    t = 5000
    base = rng.uniform(-5, 5, (t, 1, 3))
    tri = (base + rng.uniform(-0.3, 0.3, (t, 3, 3))).astype(np.float32)
    n = 1001
    org = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    d = -np.asarray(org) + rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]), ('scene',))
    sm2 = scene_shard.partition_mesh_bvh(tri, 8)
    ring = scene_shard.make_ring_hit(mesh, max_leaf=sm2.max_leaf)
    t_r, _ = ring(sm2, org, d)
    assert t_r.shape == (n,)

    soup = traverse.make_soup(tri[sm2.order])
    brute = traverse.brute_force_hit(soup, org, d)
    np.testing.assert_allclose(np.asarray(t_r), np.asarray(brute.t),
                               rtol=1e-4)
