"""Tracing / profiling utilities (SURVEY §5).

The reference's PerfChrono wall-clock timers and time-per-ray display
(reference: chrono.h:6-64, Raytracer.cpp:1446+1533+1696, mainApp.cpp:
1168-1170) become: a block timer that synchronizes the device, a rays/s
accounting helper, and a jax.profiler trace context for real TPU traces.
"""

from __future__ import annotations

import contextlib
import time

import jax


def device_sync(tree):
    """TRUE device synchronization for timing.

    `jax.block_until_ready` is a NO-OP on the axon remote-TPU backend: it
    returns before remote execution finishes (measured 0.5 ms "waits" on
    waves that take 0.7 s of real device time — every round-1/2 bench
    number was contaminated by the async tail).  Forcing a device-side
    scalar reduction and fetching it to the host is the only reliable
    barrier: the 4-byte transfer cannot complete before every producer in
    the dependency chain has run.  Works (and is cheap) on all backends.
    """
    import jax.numpy as jnp
    acc = None
    for x in jax.tree.leaves(tree):
        if isinstance(x, jax.Array):
            # scalar slice on device; all probes are SUMMED into one
            # scalar so the host pays exactly ONE ~30ms tunnel round
            # trip — a device_get per leaf costs ~30ms EACH (this very
            # bug masqueraded as an '82ms pallas dispatch overhead'
            # during round-3 profiling: 4-output kernels timed 3 round
            # trips slower than 1-output ones)
            v = x[tuple(0 for _ in range(x.ndim))]
            v = jnp.real(v) if jnp.iscomplexobj(v) else v
            v = v.astype(jnp.float32)
            acc = v if acc is None else acc + v
        else:
            jax.block_until_ready(x)
    if acc is not None:
        jax.device_get(acc)
    return tree


class PerfChrono:
    """Device-synchronized wall timer (the reference's PerfChrono)."""

    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter()

    def diff_ms(self, sync=None):
        if sync is not None:
            device_sync(sync)
        return (time.perf_counter() - self._t0) * 1000.0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rays_per_second(width, height, spp, nb_bounces, seconds,
                    shadow_rays_per_bounce=1):
    """Hardware ray-op accounting for the lockstep wavefront: every lane
    does one closest-hit and `shadow_rays_per_bounce` any-hit sweeps per
    bounce (no compaction), so ray ops = W*H*spp*bounces*(1+shadow)."""
    total = width * height * spp * nb_bounces * (1 + shadow_rays_per_bounce)
    return total / max(seconds, 1e-12)
