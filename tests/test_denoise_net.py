"""Kernel-predicting denoiser: structure, energy bounds, fallback."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.render import denoise_net as dnn


def test_apply_is_convex_combination():
    # softmax kernels cannot invent energy: every output channel lies
    # within the neighborhood min/max of the input radiance
    rng = np.random.default_rng(0)
    params = dnn.init_params(jax.random.PRNGKey(1))
    c = jnp.asarray(rng.random((24, 28, 3)).astype(np.float32) * 10.0)
    a = jnp.asarray(rng.random((24, 28, 3)).astype(np.float32))
    n = jnp.asarray(rng.random((24, 28, 3)).astype(np.float32))
    out = np.asarray(dnn.denoise_apply(params, c, a, n))
    assert out.shape == (24, 28, 3)
    assert np.isfinite(out).all()
    assert out.min() >= float(c.min()) - 1e-5
    assert out.max() <= float(c.max()) + 1e-5


def test_weight_roundtrip(tmp_path):
    params = dnn.init_params(jax.random.PRNGKey(0))
    p = str(tmp_path / 'w.npz')
    dnn.save_weights(params, p)
    loaded = dnn.load_weights(p)
    c = jnp.ones((16, 16, 3))
    a = jnp.ones((16, 16, 3))
    n = jnp.ones((16, 16, 3))
    o1 = np.asarray(dnn.denoise_apply(params, c, a, n))
    o2 = np.asarray(dnn.denoise_apply(loaded, c, a, n))
    np.testing.assert_array_equal(o1, o2)


def test_flat_region_smooths():
    # constant-signal + noise: ANY convex kernel with trained-or-not
    # weights reduces variance on a flat field when kernels average
    rng = np.random.default_rng(3)
    params = dnn.init_params(jax.random.PRNGKey(2))
    base = np.full((32, 32, 3), 2.0, np.float32)
    noisy = base + rng.normal(0, 0.5, base.shape).astype(np.float32)
    a = jnp.ones((32, 32, 3))
    n = jnp.ones((32, 32, 3))
    out = np.asarray(dnn.denoise_apply(params, jnp.asarray(noisy), a, n))
    # interior only (border clamping biases edges)
    err_in = np.mean((noisy[4:-4, 4:-4] - 2.0) ** 2)
    err_out = np.mean((out[4:-4, 4:-4] - 2.0) ** 2)
    assert err_out < err_in


def test_learned_entry_falls_back_without_weights(monkeypatch):
    monkeypatch.setattr(dnn, '_params_cache', 'unset')
    monkeypatch.setattr(dnn, 'WEIGHTS_PATH', '/nonexistent/w.npz')
    from pathtracer_tpu.render import denoise as dn
    rng = np.random.default_rng(1)
    c = rng.random((16, 16, 3)).astype(np.float32)
    a = np.ones((16, 16, 3), np.float32)
    n = np.ones((16, 16, 3), np.float32)
    got = np.asarray(dnn.denoise_learned(c, a, n))
    want = np.asarray(dn.atrous_denoise(c, a, n))
    if dnn.load_weights() is None:    # no shipped weights yet
        np.testing.assert_allclose(got, want, atol=1e-6)
    else:
        assert got.shape == want.shape


def test_shipped_weights_quality_gate():
    """VERDICT r04 #7: the SHIPPED weights must beat both the noisy
    input and the a-trous fallback by a clear PSNR margin on a held-out
    scene (full artifact: scripts/denoiser_eval.py -> DENOISE_EVAL.json,
    measured +11.8 dB vs noisy / +12.3 dB vs a-trous at 160x96)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    import denoiser_eval
    res = denoiser_eval.evaluate(width=96, height=64, spp_in=2, spp_ref=64,
                                 force_cpu=False)  # conftest already CPU
    assert res['learned_minus_noisy_db'] > 2.0, res
    assert res['learned_minus_atrous_db'] > 1.0, res
