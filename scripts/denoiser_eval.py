"""Denoiser quality gate (VERDICT r04 #7): PSNR of the SHIPPED learned
weights vs the noisy input AND vs the a-trous fallback on a held-out
scene, recorded to DENOISE_EVAL.json.

Held-out: the flagship bench scene (three-sphere diffuse/mirror/transp)
is NOT in train_denoiser.py's procedurally-sampled training set (seeds
0..N_SCENES of sample_scene).  The reference ships OIDN in this slot
(Raytracer.cpp:1721-1746); this records that our slot model actually
earns its place over the classical filter.

Usage: python scripts/denoiser_eval.py  (CPU ok; ~2 min)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np


def evaluate(width=160, height=96, spp_in=2, spp_ref=192, force_cpu=True):
    if force_cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import pathtracer_tpu as pt
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.render import film as film_mod
    from pathtracer_tpu.render import denoise as dn
    from pathtracer_tpu.render import denoise_net as dnn
    from pathtracer_tpu.scene import scene as scn

    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2),
                          ks=(0.1, 0.1, 0.1), ne=(30.0, 30.0, 30.0)))
    objs.append(pt.sphere((-16.0, -20.0, -10.0), 7.0, miroir=True))
    objs.append(pt.sphere((17.0, -19.0, -5.0), 8.0, transp=True,
                          refr_index=1.4))
    sc = pt.build_scene(objs, pt.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))

    def render(spp):
        cfg = rnd.RenderConfig(width=width, height=height, nrays=spp,
                               samples_per_wave=min(spp, 16),
                               has_denoiser=True)
        r = rnd.Renderer(sc, cam, cfg).render()
        n = max(r.samples_done, 1)
        color = r.aux[0] / n
        albedo = r.aux[1] / n
        nrm = r.aux[2]
        nrm = nrm / jnp.maximum(
            jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
        return color, albedo, nrm

    color_n, albedo, nrm = render(spp_in)
    color_ref, _, _ = render(spp_ref)

    import jax.numpy as jnp

    def tonemap(c):
        lin = jnp.maximum(c[::-1] / film_mod.RADIANCE_SCALE, 0.0)
        return np.asarray(jnp.clip(jnp.power(lin, 1.0 / 2.2), 0.0, 1.0))

    ref = tonemap(color_ref)

    def psnr(img):
        mse = float(np.mean((img - ref) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    out_atrous = dn.atrous_denoise(color_n, albedo, nrm)
    params = dnn.load_weights()
    assert params is not None, 'shipped denoiser_weights.npz missing'
    out_learned = dnn.denoise_apply(params, *dnn_inputs(color_n, albedo,
                                                        nrm, dnn))
    res = {
        'scene': 'flagship-3-sphere (held out)',
        'width': width, 'height': height,
        'spp_in': spp_in, 'spp_ref': spp_ref,
        'psnr_noisy_db': psnr(tonemap(color_n)),
        'psnr_atrous_db': psnr(tonemap(out_atrous)),
        'psnr_learned_db': psnr(tonemap(out_learned)),
    }
    res['learned_minus_noisy_db'] = (res['psnr_learned_db']
                                     - res['psnr_noisy_db'])
    res['learned_minus_atrous_db'] = (res['psnr_learned_db']
                                      - res['psnr_atrous_db'])
    return res


def dnn_inputs(color, albedo, nrm, dnn):
    return color, albedo, nrm


if __name__ == '__main__':
    res = evaluate()
    print(json.dumps(res, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'DENOISE_EVAL.json'), 'w') as f:
        json.dump(res, f, indent=1)
