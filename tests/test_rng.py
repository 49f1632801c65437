"""PCG32 bit-exactness: JAX uint32-pair engine vs known vectors + host twin."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.core import rng as jrng
from pathtracer_tpu.core import rng_host


def test_pcg32_known_vectors():
    """Official PCG check values: pcg32 two-arg seed (42, 54) produces the
    canonical first outputs (from the pcg32-demo of the PCG distribution)."""
    eng = rng_host.PCG32(42, 54)
    expected = [0xa15c02b7, 0x7b47f409, 0xba1d3330, 0x83d2f293,
                0xbfa4784b, 0xcbed606e]
    got = [eng.next_u32() for _ in range(6)]
    assert got == expected


def test_jax_matches_host_default_stream():
    """pcg32(i) engines (the reference's per-thread seeding,
    Raytracer.cpp:1325-1327) — compare host twin streams drawn sequentially.
    The JAX engine only implements keyed two-arg streams, so compare those."""
    keys = np.array([0, 1, 2, 3, 12345, 2**31, 2**32 - 1, 7_000_000_001 % 2**32],
                    np.uint64)
    hosts = [rng_host.PCG32(int(k), int(k)) for k in keys]

    key_hi = jnp.asarray((keys >> 32).astype(np.uint32))
    key_lo = jnp.asarray((keys & 0xFFFFFFFF).astype(np.uint32))
    state = jrng.make_stream(key_hi, key_lo)

    for draw in range(16):
        out, state = jrng.next_uint32(state)
        host_out = np.array([h.next_u32() for h in hosts], np.uint32)
        np.testing.assert_array_equal(np.asarray(out), host_out,
                                      err_msg=f"draw {draw}")


def test_uniform_convention():
    """u = out * 1/(2^32-1), float32, matching the reference invmax."""
    key_hi = jnp.zeros((4,), jnp.uint32)
    key_lo = jnp.arange(4, dtype=jnp.uint32)
    state = jrng.make_stream(key_hi, key_lo)
    u, _ = jrng.next_uniform(state)
    hosts = [rng_host.PCG32(i, i) for i in range(4)]
    expected = np.array([h.next_float() for h in hosts], np.float32)
    np.testing.assert_array_equal(np.asarray(u), expected)
    assert np.all(np.asarray(u) >= 0.0) and np.all(np.asarray(u) <= 1.0)


def test_gated_draws_leave_state_untouched():
    key = jnp.arange(8, dtype=jnp.uint32)
    state = jrng.make_stream(jnp.zeros_like(key), key)
    gate = jnp.asarray([True, False] * 4)
    _, new_state = jrng.next_uniform(state, gate=gate)
    for ns, os_ in zip(new_state[:2], state[:2]):  # state halves advance...
        same = np.asarray(ns) == np.asarray(os_)
        np.testing.assert_array_equal(same, ~np.asarray(gate))
    for ns, os_ in zip(new_state[2:], state[2:]):  # ...inc halves never do
        np.testing.assert_array_equal(np.asarray(ns), np.asarray(os_))


def test_random_per_pixel_fast_matches_reference_fill():
    slow = rng_host.random_per_pixel(7, 5)
    fast = rng_host.random_per_pixel_fast(7, 5)
    np.testing.assert_array_equal(slow, fast)
