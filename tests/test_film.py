"""Film stencil splat vs a brute-force scatter reference (the C++ loops)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.render import film as film_mod


def _brute_splat(h, w, sigma, colors, dx, dy):
    """Direct transcription of the reference splat loops
    (Raytracer.cpp:1477-1497): per-sample window scatter with SAT border
    renormalization, rows flipped."""
    fs = int(np.ceil(sigma * 2))
    offs = np.arange(-fs, fs + 1)
    f1d = np.exp(-offs**2 / (2 * sigma * sigma)) / (np.sqrt(2 * np.pi) * sigma)

    def axis_sum(i, n):
        lo = max(0, i - fs) - i + fs
        hi = min(i + fs, n - 1) - i + fs
        return f1d[lo:hi + 1].sum()

    image = np.zeros((h, w, 3))
    count = np.zeros((h, w))
    denom2 = 1.0 / (2 * sigma * sigma)
    for i in range(h):
        for j in range(w):
            k = i * w + j
            ratio = 1.0 / (axis_sum(i, h) * axis_sum(j, w))
            denom1 = ratio / (sigma * sigma * 2 * np.pi)
            for i2 in range(max(0, i - fs), min(i + fs, h - 1) + 1):
                for j2 in range(max(0, j - fs), min(j + fs, w - 1) + 1):
                    wgt = np.exp(-((i2 - i - dy[k])**2
                                   + (j2 - j - dx[k])**2) * denom2) * denom1
                    image[h - 1 - i2, j2] += colors[k] * wgt
                    count[h - 1 - i2, j2] += wgt
    return image, count


def test_stencil_splat_matches_reference_scatter():
    h, w, sigma = 12, 10, 0.5
    rng = np.random.default_rng(0)
    colors = rng.uniform(0, 10, (h * w, 3)).astype(np.float32)
    dx = rng.uniform(-0.5, 0.5, h * w).astype(np.float32)
    dy = rng.uniform(-0.5, 0.5, h * w).astype(np.float32)

    film = film_mod.make_film(w, h, sigma)
    img, cnt = film_mod.alloc(film)
    img, cnt = film_mod.splat(film, img, cnt, jnp.asarray(colors),
                              jnp.asarray(dx), jnp.asarray(dy))
    img = np.asarray(film_mod.crop(film, img))
    cnt = np.asarray(film_mod.crop(film, cnt))

    ref_img, ref_cnt = _brute_splat(h, w, sigma, colors, dx, dy)
    np.testing.assert_allclose(img, ref_img, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(cnt, ref_cnt, rtol=2e-5, atol=1e-6)


def test_block_splat_equals_full_splat():
    """Row-sharded block splats (traced row0) must sum to the full splat."""
    import jax
    h, w, sigma = 16, 8, 0.5
    rng = np.random.default_rng(1)
    colors = jnp.asarray(rng.uniform(0, 5, (h * w, 3)).astype(np.float32))
    dx = jnp.asarray(rng.uniform(-.5, .5, h * w).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-.5, .5, h * w).astype(np.float32))
    film = film_mod.make_film(w, h, sigma)

    img_full, cnt_full = film_mod.splat(film, *film_mod.alloc(film),
                                        colors, dx, dy)

    img, cnt = film_mod.alloc(film)
    bs = 4
    for r0 in range(0, h, bs):
        sl = slice(r0 * w, (r0 + bs) * w)
        img, cnt = film_mod.splat(film, img, cnt, colors[sl], dx[sl], dy[sl],
                                  row0=jnp.int32(r0), block_rows=bs)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cnt), np.asarray(cnt_full),
                               rtol=1e-5, atol=1e-6)