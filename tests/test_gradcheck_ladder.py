"""Finite-difference gradcheck on ALL FIVE config JSONs (BASELINE.md:
"gradcheck passing on all five configs"; VERDICT r03 #3).

Each config is loaded through the real scene-JSON loader with the same
procgen asset stand-ins as test_config_parity, then a central-difference
check runs against jax.grad for that config's SIGNATURE differentiable
parameters:

  config1  kd + light intensity           (Raytracer.cpp NEE weights)
  config2  per-group mesh kd + kd TEXTURE TEXELS (BRDF.h:293-404)
  config3  envmap texel + transparent-mesh kd through the Fresnel RR
           (Raytracer.cpp:438-489, Geometry.h:963-977)
  config4  MERL table entries + DoF mix   (MERLBRDFRead.cpp:181-235)
  config5  fog density + mesh Ksub through the subsurface estimator
           (Raytracer.cpp:44-192, 318-406)

Sampling decisions are detached (stop_gradient) and both FD evaluations
reuse the same PCG keys, so Monte Carlo noise cancels in the central
difference.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.io import scene_json
from pathtracer_tpu.io.image import load_hdr
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn

import test_config_parity as tcp

W, H, SPP, BOUNCES = 12, 10, 2, 3
CONFIG_DIR = tcp.CONFIG_DIR


@pytest.fixture(scope='module')
def ladder_dir(tmp_path_factory):
    import shutil
    from pathtracer_tpu.io.image import save_hdr
    from pathtracer_tpu.utils import procgen
    d = tmp_path_factory.mktemp('grad_ladder')
    for cfg in ('config1_analytic.json', 'config2_mesh.json',
                'config3_transparent.json', 'config4_merl_dof.json',
                'config5_office.json'):
        shutil.copy(os.path.join(CONFIG_DIR, cfg), d / cfg)
    tcp._write_obj(d / 'lion.obj',
                   procgen.sphere_mesh(8, 8, radius=1.0))
    tcp._write_obj(d / 'bot.obj',
                   procgen.sphere_mesh(8, 8, radius=1.0, displace_amp=0.15))
    tcp._write_obj(d / 'antiqueOffice.obj',
                   procgen.sphere_mesh(6, 6, radius=1.0))
    rng = np.random.default_rng(7)
    save_hdr(str(d / 'env.hdr'),
             rng.uniform(0.05, 3.0, (8, 16, 3)).astype(np.float32))
    tcp._write_merl(d / 'material.binary')
    # a 4x4 kd texture for the texel gradcheck (config 2's normal/alpha
    # maps ride the same Texture machinery; kd is the differentiable one)
    from PIL import Image
    tex = (rng.uniform(0.2, 0.9, (4, 4, 3)) * 255).astype(np.uint8)
    Image.fromarray(tex).save(d / 'kd_tex.png')
    return d


def _load(ladder_dir, name, texture_kd=False):
    objects, li, cam, _cfg, extras = scene_json.load_scene(
        str(ladder_dir / name))
    if texture_kd:
        for o in objects:
            if o.obj_type == scn.MESH:
                o.textures = {'kd': str(ladder_dir / 'kd_tex.png')}
    envmap = None
    if extras['envmap']:
        envmap = load_hdr(str(ladder_dir / extras['envmap']))
    sc = scn.build_scene(objects, li,
                         envmap_intensity=extras['envmap_intensity'],
                         envmap=envmap, fog=extras['fog'])
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=BOUNCES)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(W, H))
    return sc, cam, cfg, cp


def _loss(sc, cam, cfg, cp):
    img, _ = rnd.render_unsplatted(sc, cam, cp, cfg)
    return jnp.mean(img) / 196964.7


def _fd_vs_grad(make_sc, base, idx, cam, cfg, cp, eps=2e-3, rtol=0.08,
                label=''):
    """Central difference vs jax.grad at one array index."""
    def loss_wrt(val):
        return _loss(make_sc(val), cam, cfg, cp)

    grad = jax.grad(loss_wrt)(base)
    g = np.asarray(grad)
    assert np.all(np.isfinite(g)), f'{label}: non-finite grad'
    gi = float(g[idx] if np.ndim(base) else g)

    scale = max(abs(float(np.asarray(base)[idx] if np.ndim(base)
                          else base)), 1.0)
    h = eps * scale
    if np.ndim(base):
        delta = np.zeros(np.shape(base), np.float32)
        delta[idx] = h
        delta = jnp.asarray(delta)
    else:
        delta = jnp.asarray(h)
    lp = float(loss_wrt(base + delta))
    lm = float(loss_wrt(base - delta))
    fd = (lp - lm) / (2 * h)
    denom = max(abs(fd), abs(gi), 1e-12)
    assert abs(fd) > 0 or abs(gi) == 0, f'{label}: vacuous (fd==0)'
    assert abs(fd - gi) / denom < rtol, \
        f'{label}: fd {fd:.6g} vs grad {gi:.6g}'
    return gi, fd


def test_config1_kd_and_light(ladder_dir):
    sc, cam, cfg, cp = _load(ladder_dir, 'config1_analytic.json')
    _fd_vs_grad(lambda v: sc.replace(kd=v), sc.kd, (3, 0), cam, cfg, cp,
                label='config1 kd')
    _fd_vs_grad(lambda v: sc.replace(light_intensity=v),
                sc.light_intensity, (), cam, cfg, cp,
                label='config1 light')


def test_config2_mesh_kd_and_texture_texel(ladder_dir):
    sc, cam, cfg, cp = _load(ladder_dir, 'config2_mesh.json',
                             texture_kd=True)
    mesh = sc.meshes[0]
    tex = mesh.textures[0].kd
    assert tex is not None

    def with_g_kd(v):
        return sc.replace(meshes=(mesh.replace(g_kd=v),)
                          + sc.meshes[1:])
    _fd_vs_grad(with_g_kd, mesh.g_kd, (0, 1), cam, cfg, cp,
                label='config2 mesh g_kd')

    def with_texel(v):
        from pathtracer_tpu.models import texture as tex_mod
        gt = mesh.textures[0]
        gts = (tex_mod.GroupTextures(**{
            **{ch: getattr(gt, ch) for ch in
               ('kd', 'ks', 'normal', 'alpha', 'roughness', 'transp',
                'refr', 'ksub')}, 'kd': v}),) + mesh.textures[1:]
        return sc.replace(meshes=(mesh.replace(textures=gts),)
                          + sc.meshes[1:])
    # the README claims texture differentiability — check a texel the
    # stand-in mesh actually samples (uv defaults hit texel (0,0))
    _fd_vs_grad(with_texel, tex, (0, 0, 0), cam, cfg, cp,
                label='config2 kd texel')


def test_config3_envmap_texel_and_transp_kd(ladder_dir):
    sc, cam, cfg, cp = _load(ladder_dir, 'config3_transparent.json')
    assert sc.envmap is not None
    # aggregate over a whole envmap ROW (any single texel may be unseen
    # at this tiny resolution; a row always is, through dome misses)
    def with_env(v):
        return sc.replace(envmap=v)
    g = jax.grad(lambda v: _loss(with_env(v), cam, cfg, cp))(sc.envmap)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0, \
        'config3: envmap gradient vanished'
    # FD along the full-envmap direction of the gradient (directional
    # derivative check, robust to which texels are sampled)
    d = jnp.asarray(g / max(np.abs(g).max(), 1e-12))
    h = 5e-3
    lp = float(_loss(with_env(sc.envmap + h * d), cam, cfg, cp))
    lm = float(_loss(with_env(sc.envmap - h * d), cam, cfg, cp))
    fd = (lp - lm) / (2 * h)
    gd = float(jnp.sum(jnp.asarray(g) * d))
    assert abs(fd - gd) / max(abs(fd), abs(gd), 1e-12) < 0.08, (fd, gd)

    mesh = sc.meshes[0]
    _fd_vs_grad(lambda v: sc.replace(meshes=(mesh.replace(g_kd=v),)
                                     + sc.meshes[1:]),
                mesh.g_kd, (0, 0), cam, cfg, cp,
                label='config3 transp mesh kd')


def test_config4_merl_table(ladder_dir):
    sc, cam, cfg, cp = _load(ladder_dir, 'config4_merl_dof.json')
    assert sc.measured_brdfs, 'config4 must carry a MERL table'
    table = sc.measured_brdfs[0].data

    def with_table(v):
        import dataclasses
        mb = sc.measured_brdfs[0].replace(data=v)
        return sc.replace(measured_brdfs=(mb,) + sc.measured_brdfs[1:])

    # directional derivative along the gradient (single entries may be
    # unsampled at 12x10@2spp; the direction check is never vacuous)
    g = jax.grad(lambda v: _loss(with_table(v), cam, cfg, cp))(table)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0, \
        'config4: MERL gradient vanished'
    d = jnp.asarray(g / max(np.abs(g).max(), 1e-12))
    h = 2e-2
    lp = float(_loss(with_table(table + h * d), cam, cfg, cp))
    lm = float(_loss(with_table(table - h * d), cam, cfg, cp))
    fd = (lp - lm) / (2 * h)
    gd = float(jnp.sum(jnp.asarray(g) * d))
    assert abs(fd - gd) / max(abs(fd), abs(gd), 1e-12) < 0.08, (fd, gd)


def test_config5_fog_and_ksub(ladder_dir):
    sc, cam, cfg, cp = _load(ladder_dir, 'config5_office.json')
    assert sc.fog_enabled and sc.ss_enabled
    _fd_vs_grad(lambda v: sc.replace(fog_density=v), sc.fog_density, (),
                cam, cfg, cp, eps=5e-3, label='config5 fog_density')
    mesh = sc.meshes[0]
    _fd_vs_grad(lambda v: sc.replace(meshes=(mesh.replace(g_ksub=v),)
                                     + sc.meshes[1:]),
                mesh.g_ksub, (0, 0), cam, cfg, cp, eps=5e-3, rtol=0.1,
                label='config5 mesh ksub')
