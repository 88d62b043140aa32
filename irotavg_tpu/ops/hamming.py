"""Hamming distance between 256-bit descriptors (XOR + popcount).

Replaces the scalar popcount loops of the reference (FORB::distance,
third_party/DBoW2/DBoW2/FORB.cpp:81-101; descriptorDistance,
src/ViewGraph.cpp:106-122) with a dense (K1, K2) distance-matrix kernel:
the inner 8-word XOR/popcount reduction vectorises on the VPU, and the
full matrix feeds the masked-argmin matchers in `matching/`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, inline=True)
def popcount32(x):
    """Per-lane popcount of uint32 (SWAR bit-twiddle, 5 VPU ops)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


@functools.partial(jax.jit, inline=True)
def hamming_matrix(d1, d2):
    """(K1, K2) int32 Hamming distances for (K1, 8), (K2, 8) uint32 words."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])  # (K1, K2, 8)
    return jnp.sum(popcount32(x), axis=-1).astype(jnp.int32)
