"""Film: Gaussian splat accumulation + SAT border normalization + tonemap.

TPU-native counterpart of the reference's splatting loops
(reference: Raytracer.cpp:1486-1497 splat, :1276-1291 + 1354-1374 summed-area
filter-integral tables, :1540-1547 gamma/u8 encode).  Per-sample nested splat
loops become (2F+1)^2 vectorized scatter-adds over the whole wavefront, which
XLA lowers to fast sorted scatters.

The radiance scale constant 196964.7 is the reference's display divisor
(Raytracer.cpp:1543); gamma default 2.2 (Raytracer.h gamma field).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

RADIANCE_SCALE = np.float32(196964.7)


class FilmSpec(NamedTuple):
    """Static film configuration + precomputed border-normalization table."""

    width: int
    height: int
    sigma: float
    filter_size: int             # F = ceil(2*sigma) (Raytracer.cpp:1356)
    ratio: jnp.ndarray           # (H,W) 1/sum(filter integral over in-bounds window)


def make_film(width: int, height: int, sigma: float = 0.5) -> FilmSpec:
    """Build film spec with per-pixel border ratio (Raytracer.cpp:1477-1482).

    ratio(i,j) = 1 / sum of the discrete filter taps whose window survives
    border clamping.  The Gaussian taps separate as f(i)*f(j), so the
    reference's 2D SAT lookup (Raytracer.cpp:1276-1291) collapses to an
    outer product of 1D clamped-window sums — O(H+W) host work.
    """
    fsize = int(math.ceil(sigma * 2.0))
    offs = np.arange(-fsize, fsize + 1, dtype=np.float64)
    f1d = np.exp(-offs ** 2 / (2.0 * sigma * sigma)) / (
        math.sqrt(2.0 * math.pi) * sigma)

    def axis_sums(n):
        idx = np.arange(n)
        lo = np.maximum(0, idx - fsize) - idx + fsize      # first tap kept
        hi = np.minimum(idx + fsize, n - 1) - idx + fsize  # last tap kept
        csum = np.concatenate([[0.0], np.cumsum(f1d)])
        return csum[hi + 1] - csum[lo]

    fi = axis_sums(height)
    fj = axis_sums(width)
    ratio = (1.0 / np.outer(fi, fj)).astype(np.float32)
    return FilmSpec(width=width, height=height, sigma=float(sigma),
                    filter_size=fsize, ratio=jnp.asarray(ratio))


def make_film_spec_static(width: int, height: int, sigma: float) -> FilmSpec:
    """make_film usable inside a traced context (constants fold into jit)."""
    return make_film(width, height, sigma)


def splat(film: FilmSpec, image, sample_count, colors, pix_i, pix_j, dx, dy):
    """Scatter-add one wavefront of samples into the film.

    reference: Raytracer.cpp:1486-1497 — each sample contributes to the
    (2F+1)^2 window around its pixel with weight
    w = exp(-((i2-i-dy)^2 + (j2-j-dx)^2) / (2 sigma^2)) * ratio / (2 pi sigma^2),
    and the same w accumulates into sample_count.  Image rows are flipped
    (row 0 = top = i of H-1) exactly like the reference's (H-i-1) indexing.

    Args:
      image: (H, W, 3) accumulator.  sample_count: (H, W).
      colors: (N, 3); pix_i/pix_j: (N,) int32; dx/dy: (N,) jitter in [-.5, .5].
    Returns:
      (image, sample_count) updated.
    """
    h, w, fs = film.height, film.width, film.filter_size
    sigma = film.sigma
    denom2 = np.float32(1.0 / (2.0 * sigma * sigma))
    base = np.float32(1.0 / (sigma * sigma * 2.0 * np.pi))
    ratio = film.ratio[pix_i, pix_j] * base                    # (N,) denom1

    fi = pix_i.astype(jnp.float32)
    fj = pix_j.astype(jnp.float32)

    for oi in range(-fs, fs + 1):
        for oj in range(-fs, fs + 1):
            i2 = pix_i + oi
            j2 = pix_j + oj
            inb = (i2 >= 0) & (i2 < h) & (j2 >= 0) & (j2 < w)
            wgt = jnp.exp(-((i2.astype(jnp.float32) - fi - dy) ** 2
                            + (j2.astype(jnp.float32) - fj - dx) ** 2) * denom2)
            wgt = jnp.where(inb, wgt * ratio, 0.0)
            row = jnp.clip(h - 1 - i2, 0, h - 1)
            col = jnp.clip(j2, 0, w - 1)
            image = image.at[row, col].add(colors * wgt[:, None])
            sample_count = sample_count.at[row, col].add(wgt)
    return image, sample_count


def to_display(image, sample_count, gamma=2.2, progressive=True):
    """HDR accumulator -> [0,1] display floats (reference: Raytracer.cpp:1540-1547).

    progressive=True divides by max(sample_count,1) (interactive path);
    the offline path divides by sample_count after full accumulation
    (Raytracer.cpp:1687-1694) — same thing once all samples are in.
    """
    denom = jnp.maximum(sample_count, 1.0) if progressive else sample_count
    lin = image / RADIANCE_SCALE / denom[..., None]
    return jnp.clip(jnp.power(jnp.maximum(lin, 0.0), 1.0 / gamma), 0.0, 1.0)


def to_u8(display):
    return np.asarray(np.clip(np.asarray(display) * 255.0, 0.0, 255.0)
                      ).astype(np.uint8)
