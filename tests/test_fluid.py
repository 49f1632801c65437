"""MAC fluid simulator: conservation, incompressibility, settling, render."""

import numpy as np
import jax.numpy as jnp

import pathtracer_tpu as pt
from pathtracer_tpu.core import rng_host
from pathtracer_tpu.render import renderer as rnd
from pathtracer_tpu.scene import pointset as ps_mod
from pathtracer_tpu.scene import scene as scn
from pathtracer_tpu.sim import fluid


def _cfg(n=12):
    return fluid.FluidConfig(lo=(0.0, 0.0, 0.0), hi=(1.0, 1.0, 1.0),
                             nx=n, ny=n, nz=n, dt=0.01, cg_iters=200)


def test_pressure_projection_kills_divergence():
    cfg = _cfg()
    pts = fluid.seed_box(cfg, (0.1, 0.1, 0.1), (0.9, 0.5, 0.9), 2000)
    st = fluid.init_state(cfg, pts)
    st = fluid.reclassify(cfg, st)
    # inject a divergent velocity field
    rng = np.random.default_rng(0)
    st = st._replace(
        velx=jnp.asarray(rng.normal(0, 1, st.velx.shape), jnp.float32),
        vely=jnp.asarray(rng.normal(0, 1, st.vely.shape), jnp.float32),
        velz=jnp.asarray(rng.normal(0, 1, st.velz.shape), jnp.float32))
    div_before = np.asarray(fluid._divergence(cfg, st))
    fluid_cells = np.asarray(st.celltypes) == fluid.FLUID
    p, res = fluid.pressure_solve(cfg, st)
    # the solver must actually CONVERGE, not silently hit the iteration
    # cap: final ||r|| at (or near) cg_tol, and far below the initial
    # residual magnitude
    r0 = np.linalg.norm(np.asarray(
        np.where(fluid_cells, -np.asarray(fluid._divergence(cfg, st))
                 * (cfg.rho * cfg.dx[0] * cfg.dx[0] / cfg.dt), 0.0)))
    assert float(res) <= max(cfg.cg_tol * 2.0, r0 * 1e-3), (float(res), r0)
    st2 = fluid.pressure_update(cfg, st, p)
    div_after = np.asarray(fluid._divergence(cfg, st2))
    # interior fluid cells (not touching air) should be near divergence-free
    interior = fluid_cells.copy()
    interior[:1] = interior[-1:] = False
    b = np.abs(div_before[fluid_cells]).mean()
    a = np.abs(div_after[fluid_cells]).mean()
    assert a < b * 0.2, (b, a)


def test_particles_fall_under_gravity_and_stay_in_bounds():
    cfg = _cfg()
    pts = fluid.seed_box(cfg, (0.2, 0.5, 0.2), (0.8, 0.9, 0.8), 1500)
    st = fluid.init_state(cfg, pts)
    st = fluid.reclassify(cfg, st)
    y0 = float(np.asarray(st.particles)[:, 1].mean())
    st, frames = fluid.run(cfg, st, nb_frames=6)
    y1 = float(np.asarray(st.particles)[:, 1].mean())
    assert y1 < y0 - 0.02, f"particles did not fall: {y0} -> {y1}"
    p = np.asarray(st.particles)
    assert p.min() >= -1e-5 and p.max() <= 1.0 + 1e-5
    assert np.all(np.isfinite(p))
    assert len(frames) == 7


def test_solid_mask_blocks_cells():
    cfg = _cfg(8)
    objs = scn.default_objects()
    objs.append(scn.sphere((0.5, 0.5, 0.5), 0.2))
    mask = fluid.rasterize_solids(cfg, objs)
    assert mask[4, 4, 4]          # center inside the sphere
    assert not mask[0, 0, 0]
    # note: default ground plane at y=-27.3 is below this extent


def test_fluid_frame_renders_as_spheres():
    cfg = _cfg(8)
    pts = fluid.seed_box(cfg, (0.2, 0.2, 0.2), (0.8, 0.6, 0.8), 200)
    # place the fluid box into the visible scene area
    world = pts * 20.0 + np.array([-10.0, -25.0, -10.0], np.float32)
    objs = scn.default_objects()
    objs.append(scn.pointset_object(
        ps_mod.fluid_pointset(world, radius=1.0, color=(0.3, 0.5, 0.9))))
    sc = scn.build_scene(objs, scn.default_light_intensity())
    assert sc.pointsets[0].as_spheres
    cam = pt.make_camera((0, 0, 50), (0, 0, -1), (0, 1, 0))
    cp = jnp.asarray(rng_host.random_per_pixel_fast(16, 12))
    img, _ = rnd.render_unsplatted(sc, cam, cp,
                                   rnd.RenderConfig(width=16, height=12,
                                                    nrays=2))
    img = np.asarray(img)
    assert np.all(np.isfinite(img)) and img.max() > 0


def test_seed_from_object_shape_and_colors():
    """Mesh-shape particle seeding with per-particle colors (reference
    init_particles(initwithshape), fluid.h:247-364): particles fill the
    mesh sphere's volume and carry its Kd."""
    from pathtracer_tpu.scene import scene as scn
    from pathtracer_tpu.utils import procgen
    cfg = fluid.FluidConfig(lo=(-1.2, -1.2, -1.2), hi=(1.2, 1.2, 1.2),
                            nx=16, ny=16, nz=16)
    md = procgen.sphere_mesh(20, 20, radius=1.0, kd=(0.8, 0.2, 0.1))
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md))
    inside, col = fluid.cells_inside_object(cfg, objs, len(objs) - 1)
    centers = fluid._cell_centers(cfg)
    r = np.linalg.norm(centers, axis=-1)
    assert (inside == (r < 1.0)).mean() > 0.95
    np.testing.assert_allclose(col[inside].mean(0), (0.8, 0.2, 0.1),
                               atol=1e-3)
    pts, cols = fluid.seed_from_object(cfg, objs, len(objs) - 1, 2000)
    assert 1000 < len(pts) < 4000
    # particles confined to (cell-quantized) sphere volume
    assert np.linalg.norm(pts, axis=1).max() < 1.0 + 2.0 * 2.4 / 16
    np.testing.assert_allclose(cols.mean(0), (0.8, 0.2, 0.1), atol=1e-3)


def test_rasterize_mesh_solids():
    """Solid rasterization against scene MESHES via the double-ray
    inside test (reference fluid.h:120-139)."""
    from pathtracer_tpu.scene import scene as scn
    from pathtracer_tpu.utils import procgen
    cfg = fluid.FluidConfig(lo=(-1.2, -1.2, -1.2), hi=(1.2, 1.2, 1.2),
                            nx=16, ny=16, nz=16)
    md = procgen.sphere_mesh(20, 20, radius=0.6)
    objs = scn.default_objects()
    objs.append(scn.mesh_object(md))
    solid = fluid.rasterize_solids(cfg, objs)
    centers = fluid._cell_centers(cfg)
    r = np.linalg.norm(centers, axis=-1)
    inside_r = solid[r < 0.45]
    outside_r = solid[r > 0.8]
    assert inside_r.mean() > 0.9
    assert outside_r.mean() < 0.05


def test_jfa_extrapolation_reach():
    """JFA extrapolation (reference fluid.h:142-245) has UNBOUNDED reach:
    every face gets the velocity of its nearest fluid-adjacent face,
    even across a grid wider than the sweeps' 8-cell horizon; near the
    fluid both variants agree on already-valid faces."""
    import jax.numpy as jnp
    cfg = fluid.FluidConfig(lo=(0, 0, 0), hi=(1, 1, 1),
                            nx=24, ny=24, nz=24)
    pts = fluid.seed_box(cfg, (0.05, 0.05, 0.05), (0.2, 0.2, 0.2), 500)
    st = fluid.init_state(cfg, pts)
    st = fluid.reclassify(cfg, st)
    rng = np.random.default_rng(0)
    st = st._replace(velx=jnp.asarray(rng.normal(0, 1, st.velx.shape),
                                      jnp.float32))
    ej = fluid.extrapolate_jfa(cfg, st)
    # valid faces untouched
    fluidm = np.asarray(st.celltypes) == fluid.FLUID
    fp = np.pad(fluidm, 1)
    validx = fp[1:-1, 1:-1, :-1] | fp[1:-1, 1:-1, 1:]
    np.testing.assert_array_equal(np.asarray(ej.velx)[validx],
                                  np.asarray(st.velx)[validx])
    # the far corner face carries a value drawn from the valid set
    # (nearest-site copy), not its own garbage
    far = float(np.asarray(ej.velx)[-1, -1, -1])
    valid_vals = np.asarray(st.velx)[validx]
    assert np.any(np.isclose(valid_vals, far)), far
    # the far value is NOT the face's own pre-extrapolation garbage
    assert far != float(np.asarray(st.velx)[-1, -1, -1])
