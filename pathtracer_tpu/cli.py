"""Headless CLI — the reference's scriptable entry point.

`python -m pathtracer_tpu.cli scene.json [out.png] [name-substitution]`
mirrors `rayTracer scene.scn [out.img] [name-substitution]`
(reference: mainApp.cpp:38-49): load the scene, run the offline render,
save the image, exit.  `--progressive` streams preview saves per wave (the
render_image autosave path, Raytracer.cpp:1549-1558).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('scene', help='scene JSON path')
    p.add_argument('output', nargs='?', default='export.png')
    p.add_argument('name_subst', nargs='?', default=None,
                   help="replaces '#' in mesh paths (batch renders)")
    p.add_argument('--spp', type=int, default=None, help='override nrays')
    p.add_argument('--size', type=str, default=None, help='WxH override')
    p.add_argument('--cpu', action='store_true', help='force CPU backend')
    p.add_argument('--progressive', action='store_true',
                   help='save preview after every wave')
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from .io import image as image_io
    from .io import scene_json
    from .render.renderer import Renderer
    from .scene import scene as scn

    if args.scene.lower().endswith('.scn'):
        # the reference's text format (Raytracer.cpp:1096-1236)
        from .io import scn_import
        objects, light_intensity, cam, cfg, extras = scn_import.load_scn(
            args.scene, args.name_subst)
    else:
        objects, light_intensity, cam, cfg, extras = scene_json.load_scene(
            args.scene, args.name_subst)
    if args.spp:
        cfg = cfg._replace(nrays=args.spp)
    if args.size:
        w, h = (int(x) for x in args.size.split('x'))
        cfg = cfg._replace(width=w, height=h)

    envmap = None
    if extras.get('envmap'):
        from .io.image import load_hdr, load_image
        ep = extras['envmap']
        envmap = (load_hdr(ep) if ep.lower().endswith('.hdr')
                  else load_image(ep))

    sc = scn.build_scene(objects, light_intensity,
                         envmap_intensity=extras.get('envmap_intensity', 1.0),
                         envmap=envmap)

    r = Renderer(sc, cam, cfg)
    t0 = time.perf_counter()
    if args.progressive:
        while r.samples_done < cfg.nrays:
            r.step(min(cfg.samples_per_wave, cfg.nrays - r.samples_done))
            image_io.save_image(args.output, r.u8())
            dt = time.perf_counter() - t0
            print(f'{r.samples_done}/{cfg.nrays} spp  '
                  f'{dt / max(r.samples_done, 1):.2f} s/spp', flush=True)
    else:
        r.render()
    dt = time.perf_counter() - t0
    rays = cfg.width * cfg.height * cfg.nrays * cfg.nb_bounces * 2
    print(f'rendered {cfg.width}x{cfg.height} @{cfg.nrays}spp in {dt:.1f}s '
          f'({rays / dt / 1e6:.1f}M rays/s)')
    image_io.save_image(args.output, r.u8())
    print(f'saved {args.output}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
