"""Two-process multi-host render == single-process render (VERDICT r3 #7).

Spawns two REAL OS processes, each with 4 virtual CPU devices, wired by
`init_multihost` (jax.distributed + Gloo) into one 8-device runtime.
They render the default scene through the process-agnostic
`make_sharded_render` (rows over the global 'dp' axis — film psum
crosses the process boundary) and process 0 writes the image; the image
must match this process's own single-process 8-device render of the
same scene exactly (same draw order, same splat; reduction-order float
noise bounded by allclose).

SURVEY §5 distributed backend; the reference's one-box OpenMP row loop
(Raytracer.cpp) has no multi-host story to compare against.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_matches_single(tmp_path):
    import jax
    if jax.default_backend() != "cpu":
        pytest.skip("CPU-only multi-process harness")

    out = str(tmp_path / "mh_image.npz")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            o, _ = p.communicate()
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o[-4000:]}"
    assert os.path.exists(out), outs[0][-4000:]

    got = np.load(out)

    # single-process reference on this process's 8 virtual devices
    import pathtracer_tpu as pt
    from pathtracer_tpu.core import rng_host
    from pathtracer_tpu.parallel import sharding
    from pathtracer_tpu.render import film as film_mod
    from pathtracer_tpu.render import renderer as rnd
    from pathtracer_tpu.scene import scene as scn

    W, H, SPP = 24, 16, 2
    mesh = sharding.make_mesh(dp=8, sp=1)
    sc = scn.build_scene(scn.default_objects(),
                         scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=W, height=H, nrays=SPP, nb_bounces=2,
                           samples_per_wave=SPP)
    film = film_mod.make_film(W, H, cfg.sigma_filter)
    img, cnt = sharding.make_sharded_render(mesh, cfg, film.ratio)(
        sc, cam, np.asarray(rng_host.random_per_pixel_fast(W, H)))
    np.testing.assert_allclose(got["image"],
                               np.asarray(film_mod.crop(film, img)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got["count"],
                               np.asarray(film_mod.crop(film, cnt)),
                               rtol=1e-5, atol=1e-6)
