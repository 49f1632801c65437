"""Importing the reference's text .scn format."""

import textwrap

import numpy as np

from pathtracer_tpu.io import scn_import
from pathtracer_tpu.scene import scene as scn


def _obj_base(name='Sphere', miroir=0, transl=(0, 0, 0), ntex=0):
    tex = ''
    for _ in range(ntex):
        tex += 'texture: Null\nmultiplier: (0.700000, 0.300000, 0.200000)\n'
    return textwrap.dedent(f"""\
        name: {name}
        miroir: {miroir}
        ghost: 0
        translation: ({transl[0]:.6f}, {transl[1]:.6f}, {transl[2]:.6f})
        rotation: (1.000000, 0.000000, 0.000000, 0.000000, 1.000000, 0.000000, 0.000000, 0.000000, 1.000000)
        center: (0.000000, 0.000000, 0.000000)
        scale: 1.000000
        display_edges: 0
        interp_normals: 1
        flip_normals: 0
        nb_transforms: 0
        nb_textures: {1 if ntex else 0}
        """) + tex + textwrap.dedent("""\
        nb_normalmaps: 0
        nb_subsurfaces: 0
        nb_specularmaps: 0
        nb_alphamaps: 0
        nb_expmaps: 0
        nb_transpmaps: 0
        nb_refrindexmaps: 0
        """)


SCN = (textwrap.dedent("""\
    W,H: 320, 200
    nrays: 12
    nbframes: 1
    Cam: (0.000000, 0.000000, 50.000000), (0.000000, 0.000000, -1.000000), (0.000000, 1.000000, 0.000000)
    fov: 0.610865
    focus: 50.000000
    aperture: 0.100000
    sigma_filter: 0.500000
    gamma: 2.200000
    bounces: 3
    has_denoiser: 0
    intensite_lum: 3183098.750000
    intensite_envmap: 1.000000
    nbobjects: 4
    NEW SPHERE
    """)
    + _obj_base('Sphere')
    + textwrap.dedent("""\
    is_envmap: 0
    envmapfilename:
    O: (10.000000, 23.000000, 15.000000)
    R: 10.000000
    NEW SPHERE
    """)
    + _obj_base('Sphere')
    + textwrap.dedent("""\
    is_envmap: 0
    envmapfilename:
    O: (0.000000, 0.000000, 0.000000)
    R: 1000000.000000
    NEW PLANE
    """)
    + _obj_base('Plane', transl=(0, -27.3, 0))
    + textwrap.dedent("""\
    Point: (0.000000, 0.000000, 0.000000)
    N: (0.000000, 1.000000, 0.000000)
    NEW SPHERE
    """)
    + _obj_base('Sphere', ntex=1)
    + textwrap.dedent("""\
    is_envmap: 0
    envmapfilename:
    O: (0.000000, -17.000000, 0.000000)
    R: 10.000000
    fog_density: 0.000000
    fog_absorption: 0.000000
    fog_density_decay: 0.020000
    fog_absorption_decay: 0.020000
    fog_type: 0
    fog_phase_type: 0
    double_frustum_start_t: 0.000000
    """))


def test_scn_import_parses_reference_format(tmp_path):
    p = tmp_path / 'scene.scn'
    p.write_text(SCN)
    objects, li, cam, cfg, extras = scn_import.load_scn(str(p))
    assert cfg.width == 320 and cfg.height == 200 and cfg.nrays == 12
    assert cfg.nb_bounces == 3
    np.testing.assert_allclose(li, 3183098.75)
    assert len(objects) == 4
    assert objects[0].obj_type == scn.SPHERE
    assert objects[2].obj_type == scn.PLANE
    np.testing.assert_allclose(objects[2].translation, (0, -27.3, 0))
    np.testing.assert_allclose(objects[3].kd, (0.7, 0.3, 0.2))
    # imported scene builds and renders
    sc = scn.build_scene(objects, li, fog=extras['fog'])
    assert not sc.fog_enabled
    import pathtracer_tpu as pt
    import jax.numpy as jnp
    from pathtracer_tpu.core import rng_host
    from pathtracer_tpu.render import renderer as rnd
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    img, _ = rnd.render_unsplatted(sc, cam, cp,
                                   cfg._replace(width=16, height=12, nrays=1))
    assert np.isfinite(np.asarray(img)).all()
