"""Hamming distance between binary descriptors as MXU matmuls.

The TPU-native replacement for the reference's per-pair popcount loops
(DescriptorDistance, /root/reference/MCSlam/src/ORBextractor.cpp:1228, and
every BoW-bucketed matcher built on it): descriptors are expanded to ±1
bit-planes, then hamming(a, b) = (BITS - <a, b>) / 2, so an entire NxM
distance matrix is one (N, 256) x (256, M) matmul on the systolic array.

The contraction dimension (256 bits) and typical feature counts (>= 1k) map
exactly onto MXU tiles; bf16 is exact for this computation (all intermediate
values are integers <= 256 < 2^8-mantissa bound) which doubles MXU throughput
vs f32.

Canonical storage is packed uint32 (N, 8) words = 256 bits (BRIEF-256).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BITS = 256
WORDS = BITS // 32


def unpack_bits(packed: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) int8 in {0, 1} (LSB-first per word)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], BITS).astype(jnp.int8)


def pack_bits(bits: jax.Array) -> jax.Array:
    """(N, 256) {0,1} -> (N, 8) uint32 (LSB-first per word)."""
    b = bits.reshape(*bits.shape[:-1], WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


def to_planes(packed: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) ±1 planes for matmul distance."""
    bits = unpack_bits(packed)
    return (2 * bits - 1).astype(dtype)


def hamming_from_planes(a_planes: jax.Array, b_planes: jax.Array) -> jax.Array:
    """(N, 256) x (M, 256) ±1 planes -> (N, M) int32 Hamming distances."""
    dot = jax.lax.dot_general(
        a_planes,
        b_planes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return ((BITS - dot) * 0.5).astype(jnp.int32)


def hamming_matrix(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances."""
    return hamming_from_planes(to_planes(a_packed), to_planes(b_packed))


def hamming_pairwise(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Elementwise distance of aligned descriptor arrays: (..., 8) -> (...,)."""
    x = jnp.bitwise_xor(a_packed, b_packed)
    return jnp.sum(_popcount32(x), axis=-1).astype(jnp.int32)


def _popcount32(x: jax.Array) -> jax.Array:
    """Bit-twiddling popcount for uint32 (VPU, no matmul needed)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)
