"""Texture channels: load, sample, and per-group device storage.

TPU-native counterpart of the reference Texture class (reference:
BRDF.h:252-426): one class serves all 8 map channels (albedo, specular,
normal, alpha, roughness, transparency-mask, refraction-index, subsurface);
color maps are /255 then gamma-2.2-linearized at load (BRDF.h:393-404),
normal maps decode (v-128)/norm (BRDF.h:406-419), sampling is point
lookup with fractional wrap (BRDF.h:270-275, 293-307), and a constant
color is an image-less channel with a multiplier (BRDF.h:254, 306-307).

Device layout: per-(mesh, group, channel) images are separate (H,W,3)
arrays (static pytree structure — group counts are small); texel gathers
are (N,)-indexed per the TPU layout rules.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.struct


def load_color_image(path: str) -> np.ndarray:
    """Color map load: /255 then ^2.2 (reference: BRDF.h:393-404)."""
    from PIL import Image
    img = np.asarray(Image.open(path).convert('RGB'), np.float32)
    return np.power(img / 255.0, 2.2).astype(np.float32)


def load_normal_image(path: str) -> np.ndarray:
    """Normal map decode: (v - 128)/|v - 128| (reference: BRDF.h:406-419).

    Note the reference subtracts 128 from raw u8 (not /255), then
    normalizes — reproduced exactly.
    """
    from PIL import Image
    img = np.asarray(Image.open(path).convert('RGB'), np.float32) - 128.0
    n = np.linalg.norm(img, axis=-1, keepdims=True)
    return (img / np.maximum(n, 1e-12)).astype(np.float32)


def load_raw_image(path: str) -> np.ndarray:
    """Raw /255-then-gamma load for scalar channels (alpha/roughness/... use
    the same loadColors path in the reference)."""
    return load_color_image(path)


@flax.struct.dataclass
class GroupTextures:
    """Optional per-group images; constant channels stay None (multiplier
    lives in MeshArrays.g_* / the analytic material table)."""

    kd: Optional[jnp.ndarray] = None        # (H,W,3) linearized
    ks: Optional[jnp.ndarray] = None
    normal: Optional[jnp.ndarray] = None    # (H,W,3) decoded tangent-space
    alpha: Optional[jnp.ndarray] = None     # (H,W,3); red channel used
    roughness: Optional[jnp.ndarray] = None
    transp: Optional[jnp.ndarray] = None
    refr: Optional[jnp.ndarray] = None
    ksub: Optional[jnp.ndarray] = None

    @property
    def any_image(self):
        return any(x is not None for x in
                   (self.kd, self.ks, self.normal, self.alpha, self.roughness,
                    self.transp, self.refr, self.ksub))


_LOADERS = {
    'kd': load_color_image, 'ks': load_color_image, 'ksub': load_color_image,
    'alpha': load_color_image, 'roughness': load_raw_image,
    'transp': load_raw_image, 'refr': load_raw_image,
    'normal': load_normal_image,
}


def make_group_textures(spec) -> 'GroupTextures':
    """Build GroupTextures from a {channel: path-or-array} dict.

    Channels: kd, ks, normal, alpha, roughness, transp, refr, ksub —
    the reference's 8 per-object texture slots (Geometry.h:399-445).
    Paths go through the channel's loader (color maps gamma-linearize,
    normal maps decode); arrays are taken as already-decoded float data.
    """
    spec = spec or {}
    kw = {}
    for ch, val in spec.items():
        if ch not in _LOADERS:
            raise ValueError(f'unknown texture channel {ch!r}')
        if val is None:
            continue
        if isinstance(val, str):
            arr = _LOADERS[ch](val)
        else:
            arr = np.asarray(val, np.float32)
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        kw[ch] = jnp.asarray(arr)
    return GroupTextures(**kw)


def wrap(u):
    """Fractional repeat wrap (reference: BRDF.h:270-275)."""
    u = u - jnp.floor(u)
    return u


def sample_point(img: jnp.ndarray, u, v):
    """Point sample at wrapped (u,v) (reference getVec, BRDF.h:293-299):
    x = u*(W-1), y = v*(H-1), truncated."""
    h, w = img.shape[0], img.shape[1]
    u = wrap(u)
    v = wrap(v)
    x = jnp.clip((u * (w - 1)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * (h - 1)).astype(jnp.int32), 0, h - 1)
    return img[y, x]


def sample_red(img: jnp.ndarray, u, v):
    """Red-channel scalar sample (reference getValRed, BRDF.h:381-392)."""
    return sample_point(img, u, v)[..., 0]
