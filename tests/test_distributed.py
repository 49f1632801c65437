"""Multi-host helpers on the single-process 8-virtual-device setup."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.parallel import distributed as dist
from pathtracer_tpu.parallel import sharding


def test_init_single_process_noop():
    pid, n = dist.init_multihost()
    assert pid == 0 and n == 1
    # idempotent
    assert dist.init_multihost() == (0, 1)


def test_global_mesh_axes():
    mesh = dist.global_mesh(sp=2)
    assert mesh.shape['dp'] * mesh.shape['sp'] == len(jax.devices())
    assert mesh.shape['sp'] == 2


def test_host_shard_rows_cover_image():
    mesh = dist.global_mesh(sp=1)
    h = 8 * mesh.shape['dp']
    r0, r1, rows = dist.host_shard_rows(h, mesh)
    # single process owns everything
    assert (r0, r1) == (0, h) and rows == 8


def test_checkpoint_path_single_process():
    assert dist.checkpoint_path('/tmp/x.npz') == '/tmp/x.npz'


def test_global_mesh_feeds_sharded_render():
    import pathtracer_tpu as pt
    from pathtracer_tpu.core import rng_host
    from pathtracer_tpu.render import film as film_mod
    from pathtracer_tpu.scene import scene as scn

    mesh = dist.global_mesh(sp=2)
    dp = mesh.shape['dp']
    w, h = 16, 4 * dp
    objs = scn.default_objects()
    objs.append(pt.sphere((0.0, -17.0, 0.0), 10.0))
    sc = pt.build_scene(objs, pt.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = pt.RenderConfig(width=w, height=h, nrays=2, nb_bounces=2)
    film = film_mod.make_film(w, h, cfg.sigma_filter)
    render = sharding.make_sharded_render(mesh, cfg, film.ratio)
    cp = jnp.asarray(rng_host.random_per_pixel_fast(w, h))
    img, cnt = render(sc, cam, cp)
    assert np.isfinite(np.asarray(img)).all()
    assert np.asarray(cnt).min() > 0
