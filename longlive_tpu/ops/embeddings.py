"""Timestep / positional embeddings (reference wan/modules/model.py:15-25)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    """[cos | sin] sinusoidal embedding, cos first (ref model.py:15-25).

    position: any-shaped array of (possibly fractional) timesteps.
    Returns [..., dim] float32.
    """
    assert dim % 2 == 0
    half = dim // 2
    pos = jnp.asarray(position, jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1)
