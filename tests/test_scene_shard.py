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
