"""Mid-render checkpoint/resume."""

import numpy as np

import pathtracer_tpu as pt
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import scene as scn


def test_checkpoint_resume_matches_straight_render(tmp_path):
    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=24, height=16, nrays=4, samples_per_wave=2)

    straight = pt.Renderer(sc, cam, cfg).render()
    a = np.asarray(straight.display())

    half = pt.Renderer(sc, cam, cfg).step(2)
    ckpt = str(tmp_path / 'ck.npz')
    half.save_checkpoint(ckpt)

    resumed = pt.Renderer(sc, cam, cfg).load_checkpoint(ckpt)
    assert resumed.samples_done == 2
    resumed.render()
    b = np.asarray(resumed.display())
    np.testing.assert_array_equal(a, b)


def test_checkpoint_rejects_config_mismatch(tmp_path):
    objs = scn.default_objects()
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=24, height=16, nrays=4)
    r = pt.Renderer(sc, cam, cfg).step(1)
    ckpt = str(tmp_path / 'ck.npz')
    r.save_checkpoint(ckpt)
    other = pt.Renderer(sc, cam, rnd.RenderConfig(width=24, height=16,
                                                  nrays=8))
    import pytest
    with pytest.raises(AssertionError):
        other.load_checkpoint(ckpt)


def test_preemption_guard_resumable_render(tmp_path):
    # SIGTERM mid-render -> finish wave, checkpoint, return early; a second
    # render_resumable call completes bit-identically to a straight render
    import os
    import signal
    from pathtracer_tpu.parallel.distributed import PreemptionGuard

    objs = scn.default_objects()
    objs.append(scn.sphere((0.0, -17.0, 0.0), 10.0, kd=(0.7, 0.3, 0.2)))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=24, height=16, nrays=4, samples_per_wave=1)

    a = np.asarray(pt.Renderer(sc, cam, cfg).render().display())

    ckpt = str(tmp_path / 'pre.npz')
    r = pt.Renderer(sc, cam, cfg)
    with PreemptionGuard(signals=(signal.SIGUSR1,)) as g:
        os.kill(os.getpid(), signal.SIGUSR1)   # 'scheduler preempts us'
        r.render_resumable(ckpt, guard=g)
    assert g.requested
    assert r.samples_done < cfg.nrays, 'should have stopped early'
    assert os.path.exists(ckpt), 'checkpoint must be written on preemption'

    r2 = pt.Renderer(sc, cam, cfg).render_resumable(ckpt)
    assert r2.samples_done == cfg.nrays
    np.testing.assert_array_equal(a, np.asarray(r2.display()))
    assert not os.path.exists(ckpt), 'checkpoint removed on completion'


def test_preemption_guard_restores_handlers():
    import signal
    from pathtracer_tpu.parallel.distributed import PreemptionGuard
    before = signal.getsignal(signal.SIGUSR1)
    with PreemptionGuard(signals=(signal.SIGUSR1,)) as g:
        assert signal.getsignal(signal.SIGUSR1) != before
    assert signal.getsignal(signal.SIGUSR1) == before
    assert not g.requested


def test_render_resumable_save_every(tmp_path):
    objs = scn.default_objects()
    sc = scn.build_scene(objs, scn.default_light_intensity())
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cfg = rnd.RenderConfig(width=24, height=16, nrays=4, samples_per_wave=1)
    ckpt = str(tmp_path / 'ev.npz')
    r = pt.Renderer(sc, cam, cfg).render_resumable(ckpt, save_every=2)
    assert r.samples_done == cfg.nrays
