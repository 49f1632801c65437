"""Office-scale proof-of-life render (VERDICT r04 #3).

A textured, multi-material, multi-object scene at >=8M triangles
rendered END TO END on the TPU to docs/gallery/office_8m.png, plus a
DEVICE_PARITY-style statistical check against the CPU path at reduced
resolution, written to GALLERY_PARITY.json.

Scene: two displaced spheres (one checker-textured, one specular), a
1M-tri terrain floor mesh with a procedural kd texture, a mirror sphere
and a transparent sphere (analytic), under the standard light + dome.
The meshes auto-merge into ONE world-space cluster-tier BVH (the
reference's Embree instance scene, Geometry.cpp:627-674) — the same
machinery a real antiqueOffice.obj drop would use.

Run: timeout 6000 python scripts/tpu_gallery_office.py        (TPU)
     PT_GALLERY_SMALL=1 ... (CPU smoke, tiny shapes)
"""
import sys, os
sys.path.insert(0, '/root/repo')
import json
import time

import numpy as np


def checker(n, c0, c1, tiles=12):
    ij = np.add.outer(np.arange(n) * tiles // n,
                      np.arange(n) * tiles // n) % 2
    # float arrays are taken as ALREADY-DECODED linear data by
    # make_group_textures — keep them in [0, 1]
    return np.where(ij[..., None] == 0, np.asarray(c0, np.float32),
                    np.asarray(c1, np.float32)).astype(np.float32)


def build_scene_objs(small=False):
    import pathtracer_tpu as pt
    from pathtracer_tpu.scene import scene as scn
    from pathtracer_tpu.utils import procgen
    s = 8 if small else 1
    md1 = procgen.sphere_mesh(1530 // s, 1530 // s, radius=11.0,
                              displace_amp=0.3, seed=1)        # ~4.7M
    md2 = procgen.sphere_mesh(1080 // s, 1080 // s, radius=8.0,
                              displace_amp=0.18, seed=2,
                              kd=(0.55, 0.6, 0.75))            # ~2.3M
    md3 = procgen.terrain_mesh(760 // s, extent=55.0, amp=4.0)  # ~1.2M
    objs = scn.default_objects()
    objs.append(scn.mesh_object(
        md1, translation=(-9.0, -10.0, -12.0),
        textures={'kd': checker(256, (0.85, 0.45, 0.25), (0.9, 0.85, 0.8))}))
    objs.append(scn.mesh_object(
        md2, translation=(11.0, -14.0, 2.0),
        ks=(0.25, 0.25, 0.25), ne=(80.0, 80.0, 80.0)))
    objs.append(scn.mesh_object(
        md3, translation=(0.0, -26.0, 0.0),
        textures={'kd': checker(256, (0.45, 0.5, 0.35), (0.3, 0.3, 0.32))}))
    objs.append(pt.sphere((-20.0, -21.0, 8.0), 5.5, miroir=True))
    objs.append(pt.sphere((2.0, -22.5, 16.0), 4.5, transp=True,
                          refr_index=1.4))
    n_tris = md1.num_triangles + md2.num_triangles + md3.num_triangles
    return objs, n_tris


def _camera():
    import pathtracer_tpu as pt
    d = np.asarray([0.0, -0.33, -1.0])
    return pt.make_camera((0.0, 4.0, 58.0), tuple(d / np.linalg.norm(d)),
                          (0, 1, 0))


def render(width, height, spp, spw, objs, bounces=3):
    import pathtracer_tpu as pt
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.scene import scene as scn
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = _camera()
    cfg = rnd.RenderConfig(width=width, height=height, nrays=spp,
                           nb_bounces=bounces, samples_per_wave=spw,
                           compact_rays=True)
    r = rnd.Renderer(sc, cam, cfg)
    t0 = time.perf_counter()
    r.render()
    from pathtracer_tpu.utils.profiling import device_sync
    device_sync(r.image)
    dt = time.perf_counter() - t0
    st = r.stats(dt)
    return r, st, dt, sc


def stats_of(img):
    h, w = img.shape[:2]
    mid = img[h // 4: 3 * h // 4, w // 4: 3 * w // 4]
    cols = img.mean(axis=(0, 1))
    return {
        'mean': float(img.mean()), 'center_mean': float(mid.mean()),
        'nonzero_frac': float((img.sum(-1) > 0).mean()),
        'rgb_means': [float(c) for c in cols],
    }


def _ref_main(spec):
    """Subprocess mode: render the reduced-res reference on the CPU
    backend (use_cluster defaults off there -> lockstep tiers)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    wp, hp = (int(x) for x in spec.split('x'))
    small = os.environ.get('PT_GALLERY_SMALL') == '1'
    objs, _ = build_scene_objs(small)
    r, _, _, sc = render(wp, hp, 2, 2, objs, bounces=3)
    assert not sc.meshes[0].use_cluster
    np.save('/tmp/gallery_office_ref.npy', np.asarray(r.display()))


def main():
    small = os.environ.get('PT_GALLERY_SMALL') == '1'
    if small:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    objs, n_tris = build_scene_objs(small)
    print(f'total mesh tris: {n_tris}', flush=True)
    if not small:
        assert n_tris >= 8_000_000

    # reduced-res parity first (cheap on both paths)
    wp, hp = (64, 36) if small else (96, 54)
    rp, stp, dtp, scp = render(wp, hp, 2, 2, objs, bounces=3)
    img_dev = np.asarray(rp.display())
    m = scp.meshes[0]
    print(f'merged mesh: {m.num_triangles} tris, cluster={m.use_cluster}, '
          f'backface={m.backface_cull}', flush=True)

    # reference image from the CPU backend in a SUBPROCESS (same
    # algorithms through the lockstep XLA tiers).  Running the lockstep
    # traversal of the 8M-node merged BVH ON THE TPU instead faulted
    # the worker (multi-minute single dispatch — the round-2 failure
    # class CLAUDE.md documents); the CPU backend walks it safely.
    import subprocess
    env = dict(os.environ)
    env['PT_GALLERY_REF'] = f'{wp}x{hp}'
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=True, timeout=3600)
    img_ref = np.load('/tmp/gallery_office_ref.npy')
    close = np.isclose(img_dev, img_ref, rtol=1e-3, atol=5e-3).all(-1)
    parity = {
        'tris': int(m.num_triangles),
        'reduced_res': [wp, hp],
        'frac_pixels_close': float(close.mean()),
        'dev': stats_of(img_dev), 'ref': stats_of(img_ref),
    }
    print(json.dumps(parity, indent=1), flush=True)
    assert parity['frac_pixels_close'] > 0.97, parity

    # the gallery frame
    W, H, SPP = (128, 72, 2) if small else (1920, 1080, 16)
    r, st, dt, _ = render(W, H, SPP, 1 if not small else 2, objs)
    img = np.asarray(r.display())
    assert np.isfinite(img).all()
    out = {'gallery': 'docs/gallery/office_8m.png', 'tris': n_tris,
           'spp': SPP, 'seconds': dt,
           'live_rays_per_s': st['rays_per_second'],
           'parity': parity}
    from pathtracer_tpu.io import image as image_io
    os.makedirs('docs/gallery', exist_ok=True)
    image_io.save_image('docs/gallery/office_8m.png',
                        (np.clip(img, 0, 1) * 255).astype(np.uint8))
    with open('GALLERY_PARITY.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != 'parity'},
                     indent=1), flush=True)


if __name__ == '__main__':
    ref = os.environ.get('PT_GALLERY_REF')
    if ref:
        _ref_main(ref)
    else:
        main()
