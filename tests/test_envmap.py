"""Environment dome: lat-long lookup, intensity scaling, HDR loader."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.io.image import load_hdr
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn

W, H = 16, 12


def test_envmap_lights_the_sky():
    # vertical gradient envmap: dark at the bottom, bright at the top
    eh, ew = 32, 64
    env = np.zeros((eh, ew, 3), np.float32)
    env[..., 0] = np.linspace(0, 1, eh)[:, None]    # red ramps with theta
    env[..., 2] = 0.5
    objs = scn.default_objects()
    sc = scn.build_scene(objs, scn.default_light_intensity(), envmap=env,
                         envmap_intensity=2.0)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=1, nb_bounces=1)
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    img = np.asarray(img)

    # a sky pixel: dome radiance = tex * 100000/255 * intensity
    sky = img[H - 2, W // 2]
    assert sky[2] > 0, "blue channel of the dome should light the sky"
    ratio = sky[2] / (0.5 * 100000.0 / 255.0 * 2.0)
    assert 0.9 < ratio < 1.1, f"dome scaling off: {ratio}"
    # upper rays see larger theta (N.y ~ +1 -> theta ~ 1) -> more red
    assert img[H - 2, W // 2][0] > img[H - 2, W // 2][2] * 0.5


def test_envmap_feeds_indirect_light():
    """With a bright dome, surfaces receive indirect env light."""
    env_dark = np.zeros((8, 16, 3), np.float32)
    env_bright = np.full((8, 16, 3), 1.0, np.float32)
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=4, nb_bounces=2)

    def render(env):
        objs = scn.default_objects()
        objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.6, 0.6, 0.6)))
        sc = scn.build_scene(objs, scn.default_light_intensity(), envmap=env)
        img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
        # look at the sphere region only (sensor rows mid-low, center)
        return float(np.asarray(img)[3:6, 6:10].mean())

    bright = render(env_bright)
    dark = render(env_dark)
    # env radiance (1.0*100000/255 ~ 392) is small next to the direct light
    # (~3.2e6) — require a measurable, strictly positive lift
    assert bright > dark * 1.01, (bright, dark)


def test_hdr_loader_roundtrip(tmp_path):
    """Write a flat (uncompressed) Radiance file and read it back."""
    h, w = 4, 8
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 200   # r mantissa
    rgbe[..., 1] = 100
    rgbe[..., 2] = 50
    rgbe[..., 3] = 128   # exponent 128 -> scale 2^(128-136) = 1/256
    p = tmp_path / 't.hdr'
    with open(p, 'wb') as f:
        f.write(b'#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n')
        f.write(f'-Y {h} +X {w}\n'.encode())
        f.write(rgbe.tobytes())
    img = load_hdr(str(p))
    assert img.shape == (h, w, 3)
    np.testing.assert_allclose(img[0, 0], [200 / 256, 100 / 256, 50 / 256],
                               rtol=1e-6)
