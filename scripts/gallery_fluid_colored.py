"""Colored-fluid gallery frame (VERDICT r04 #5d).

Seeds particles from a checker-TEXTURED mesh sphere (per-particle colors
= Kd at the nearest surface, reference init_particles fluid.h:247-364),
simulates a few frames of the MAC solver (JFA extrapolation), renders
one frame with the clustered particle-sphere tier, and writes
docs/gallery/fluid_colored.png.

Run: python scripts/gallery_fluid_colored.py   (CPU, ~2-4 min)
"""
import sys, os
sys.path.insert(0, '/root/repo')
import numpy as np


def checker(n, c0, c1, tiles=8):
    ij = np.add.outer(np.arange(n) * tiles // n,
                      np.arange(n) * tiles // n) % 2
    # float arrays are taken as ALREADY-DECODED linear data by
    # make_group_textures — keep them in [0, 1]
    return np.where(ij[..., None] == 0, np.asarray(c0, np.float32),
                    np.asarray(c1, np.float32)).astype(np.float32)


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import pathtracer_tpu as pt
    from pathtracer_tpu.scene import scene as scn
    from pathtracer_tpu.scene import pointset as ps_mod
    from pathtracer_tpu.sim import fluid
    from pathtracer_tpu.utils import procgen
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.io import image as image_io

    cfg = fluid.FluidConfig(lo=(-12.0, -26.0, -12.0), hi=(12.0, -2.0, 12.0),
                            nx=24, ny=24, nz=24, dt=0.03, nsubsteps=2)
    md = procgen.sphere_mesh(28, 28, radius=6.0)
    shape_objs = scn.default_objects()
    shape_objs.append(scn.mesh_object(
        md, translation=(0.0, -10.0, 0.0),
        textures={'kd': checker(128, (0.9, 0.35, 0.15), (0.2, 0.45, 0.9))}))
    pts, cols = fluid.seed_from_object(cfg, shape_objs, len(shape_objs) - 1,
                                       18000)
    print(f'seeded {len(pts)} colored particles', flush=True)

    st = fluid.init_state(cfg, pts)
    st = fluid.reclassify(cfg, st)
    st, frames = fluid.run(cfg, st, nb_frames=10)
    p_final = frames[-1]

    objs = scn.default_objects()
    ps = ps_mod.fluid_pointset(p_final, obj_row=0, radius=0.55, color=cols)
    objs.append(scn.pointset_object(ps))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 55), (0, 0, -1), (0, 1, 0))
    cfg_r = rnd.RenderConfig(width=320, height=240, nrays=8,
                             samples_per_wave=4, nb_bounces=2)
    r = rnd.Renderer(sc, cam, cfg_r).render()
    img = np.asarray(r.display())
    assert np.isfinite(img).all() and img.max() > 0
    os.makedirs('docs/gallery', exist_ok=True)
    image_io.save_image('docs/gallery/fluid_colored.png',
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print('saved docs/gallery/fluid_colored.png', flush=True)


if __name__ == '__main__':
    main()
