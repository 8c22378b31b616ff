"""Sine position embeddings (reference ``maggie/network/module/position_encoding.py``)."""

from __future__ import annotations

import jax.numpy as jnp


def temporal_position_embedding_sine(
    b: int, n_f: int, h: int, w: int, num_pos_feats: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """3D (z/y/x) sine PE; spatial dims get 3/8·C each, temporal the remainder
    (reference ``position_encoding.py:61-111``). Returns (b, C, n_f, h, w)."""
    spatial_feats = num_pos_feats // 8 * 3
    temporal_feats = num_pos_feats - spatial_feats * 2

    y_embed = jnp.broadcast_to(jnp.arange(1, h + 1, dtype=jnp.float32)[None, None, :, None], (b, n_f, h, w))
    x_embed = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=jnp.float32)[None, None, None, :], (b, n_f, h, w))
    z_embed = jnp.broadcast_to(jnp.arange(1, n_f + 1, dtype=jnp.float32)[None, :, None, None], (b, n_f, h, w))

    def encode(embed, feats):
        dim_t = jnp.arange(feats, dtype=jnp.float32)
        dim_t = temperature ** (2 * (dim_t // 2) / feats)
        pos = embed[..., None] / dim_t
        sin = jnp.sin(pos[..., 0::2])
        cos = jnp.cos(pos[..., 1::2])
        return jnp.stack([sin, cos], axis=-1).reshape(*embed.shape, -1)

    pos_z = encode(z_embed, temporal_feats)
    pos_y = encode(y_embed, spatial_feats)
    pos_x = encode(x_embed, spatial_feats)
    pos = jnp.concatenate([pos_z, pos_y, pos_x], axis=-1)  # (b, n_f, h, w, C)
    return jnp.transpose(pos, (0, 4, 1, 2, 3))
