"""Extensible rank-1 lattice QMC sampler + Cranley–Patterson rotation.

Reproduces the reference's per-sample 2D low-discrepancy points
(reference: Raytracer.cpp:1302-1319) and the per-pixel Cranley–Patterson
rotation of those points used for indirect bounce directions
(reference: Raytracer.cpp:580-589, randomPerPixel fill Raytracer.cpp:1340-1344).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Lattice generators (reference: Raytracer.cpp:1316-1317, lattice32001_order2).
_GEN_X = 1
_GEN_Y = 182667
_OFF_X = 0.456789123
_OFF_Y = 0.123456789


def reverse_bits_u32(n):
    """Bit-reverse a uint32 (reference: Raytracer.cpp:1302-1309)."""
    n = jnp.asarray(n, jnp.uint32)
    n = (n << 16) | (n >> 16)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def extensible_lattice_2d(sample_id):
    """2D lattice point for sample index (reference: Raytracer.cpp:1311-1319).

    phi = bitreverse(id) * 2^-32;  (x, y) = frac(phi * gen + offset).
    Returns (..., 2) float32.
    """
    rid = reverse_bits_u32(sample_id)
    phi = rid.astype(jnp.float32) * jnp.float32(2.0**-32)
    x = jnp.mod(phi * _GEN_X + _OFF_X, 1.0)
    y = jnp.mod(phi * _GEN_Y + _OFF_Y, 1.0)
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def extensible_lattice_2d_np(sample_id):
    """Host/numpy twin of extensible_lattice_2d for scene prep and tests."""
    n = np.asarray(sample_id, np.uint32)
    n = (n << np.uint32(16)) | (n >> np.uint32(16))
    n = ((n & np.uint32(0x00FF00FF)) << np.uint32(8)) | ((n & np.uint32(0xFF00FF00)) >> np.uint32(8))
    n = ((n & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | ((n & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    n = ((n & np.uint32(0x33333333)) << np.uint32(2)) | ((n & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    n = ((n & np.uint32(0x55555555)) << np.uint32(1)) | ((n & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    phi = n.astype(np.float32) * np.float32(2.0**-32)
    x = np.mod(phi * _GEN_X + np.float32(_OFF_X), 1.0)
    y = np.mod(phi * _GEN_Y + np.float32(_OFF_Y), 1.0)
    return np.stack([x, y], axis=-1).astype(np.float32)


def cranley_patterson(lattice_pt, pixel_shift):
    """frac(lattice + per-pixel shift) (reference: Raytracer.cpp:582-583)."""
    return jnp.mod(lattice_pt + pixel_shift, 1.0)
