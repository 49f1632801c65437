"""C++ native BVH builder vs the numpy builder: equivalent traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu.ops import bvh as bvh_mod
from pathtracer_tpu.ops import traverse


def _random_mesh(t, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-4, 4, (t, 1, 3))
    return (base + rng.uniform(-0.4, 0.4, (t, 3, 3))).astype(np.float32)


@pytest.fixture(scope='module')
def native_available():
    if bvh_mod._load_native() is None:
        pytest.skip('g++ unavailable — native builder not compiled')
    return True


def test_native_builds_and_covers(native_available):
    tri = _random_mesh(777)
    v = tri
    fb = bvh_mod.build_bvh_native(v.min(1), v.max(1), v.mean(1))
    assert fb is not None
    assert sorted(fb.order.tolist()) == list(range(777))
    leaves = [(a, b) for a, b, lf in zip(fb.node_a, fb.node_b, fb.node_leaf)
              if lf]
    covered = sorted(i for a, b in leaves for i in range(a, b))
    assert covered == list(range(777))
    assert fb.n_nodes <= 2 * 777


def test_native_traversal_matches_numpy_build(native_available):
    tri = _random_mesh(600, seed=3)
    v = tri
    fb_np = bvh_mod.build_bvh_from_bounds(v.min(1), v.max(1), v.mean(1),
                                          prefer_native=False)
    fb_cc = bvh_mod.build_bvh_native(v.min(1), v.max(1), v.mean(1))

    rng = np.random.default_rng(1)
    org = jnp.asarray(rng.uniform(-6, 6, (256, 3)).astype(np.float32))
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)

    out = {}
    for name, fb in (('numpy', fb_np), ('native', fb_cc)):
        soup = traverse.make_soup(tri[fb.order])
        bvh = traverse.upload_bvh(fb)
        mh = traverse.bvh_hit(bvh, soup, org, d, max_leaf=fb.max_leaf)
        out[name] = (np.asarray(mh.t), fb.order[np.maximum(
            np.asarray(mh.tri), 0)])
    np.testing.assert_allclose(out['numpy'][0], out['native'][0], rtol=1e-5)
    hit = out['numpy'][0] < 1e29
    # same original triangle wins except exact ties
    same = (out['numpy'][1][hit] == out['native'][1][hit])
    assert same.mean() > 0.99


def test_native_is_used_for_large_meshes(native_available, monkeypatch):
    monkeypatch.setattr(bvh_mod, 'NATIVE_BUILD_MIN_TRIS', 100)
    tri = _random_mesh(500, seed=5)
    called = {}
    orig = bvh_mod.build_bvh_native

    def spy(*a, **k):
        called['yes'] = True
        return orig(*a, **k)

    monkeypatch.setattr(bvh_mod, 'build_bvh_native', spy)
    bvh_mod.build_bvh(tri)
    assert called.get('yes')
