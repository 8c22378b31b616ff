"""Mask2Former-style attention layers with torch ``nn.MultiheadAttention`` parity.

Re-implements reference ``maggie/network/module/mask_attention.py:9-206``:
post-norm Self/Cross attention layers (cross returns the head-averaged attention
matrix, needed by the max-attention loss at ``instance_matte_decoder.py:101-109``)
and the FFN layer. Tensors follow the reference's seq-first convention (L, B, E).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = float("-inf")


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention with packed in-proj, seq-first I/O.

    Returns (output (L, B, E), attention weights averaged over heads (B, L, S)).
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # (L, B, E)
        key: jax.Array,    # (S, B, E)
        value: jax.Array,  # (S, B, E)
        attn_mask: Optional[jax.Array] = None,          # bool (B, L, S) or (L, S); True = disallow
        key_padding_mask: Optional[jax.Array] = None,   # bool (B, S); True = ignore
    ) -> tuple[jax.Array, jax.Array]:
        e = self.embed_dim
        h = self.num_heads
        hd = e // h
        # params are f32 masters; compute follows the activation dtype (bf16 under
        # mixed precision), with softmax/logits kept in f32 below
        dt = query.dtype
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * e, e)).astype(dt)
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,)).astype(dt)
        q = query @ in_w[:e].T + in_b[:e]
        k = key.astype(dt) @ in_w[e:2 * e].T + in_b[e:2 * e]
        v = value.astype(dt) @ in_w[2 * e:].T + in_b[2 * e:]

        L, B, _ = q.shape
        S = k.shape[0]
        # (L, B, E) -> (B, h, L, hd)
        q = q.reshape(L, B, h, hd).transpose(1, 2, 0, 3) * (hd ** -0.5)
        k = k.reshape(S, B, h, hd).transpose(1, 2, 0, 3)
        v = v.reshape(S, B, h, hd).transpose(1, 2, 0, 3)

        logits = jnp.einsum("bhld,bhsd->bhls", q, k, preferred_element_type=jnp.float32)
        if attn_mask is not None:
            m = attn_mask
            if m.ndim == 2:
                m = m[None, None]
            else:
                m = m[:, None]
            logits = jnp.where(m, NEG_INF, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        if attn_mask is not None or key_padding_mask is not None:
            # rows with every key masked: torch yields NaN (and the reference's engine
            # skips empty-mask samples, ``engine/test.py:125``); emit zeros instead so
            # padded instances stay finite — identical result on any valid row
            all_masked = jnp.all(logits == NEG_INF, axis=-1, keepdims=True)
            attn = jnp.where(all_masked, 0.0, attn)
        out = jnp.einsum("bhls,bhsd->bhld", attn.astype(v.dtype), v)
        out = out.transpose(2, 0, 1, 3).reshape(L, B, e)
        out_w = self.param("out_proj_weight", nn.initializers.xavier_uniform(), (e, e)).astype(dt)
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (e,)).astype(dt)
        out = out @ out_w.T + out_b
        return out, attn.mean(axis=1)  # torch averages attention over heads


class LayerNorm(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # f32 statistics, output back in the activation's compute dtype
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x.astype(jnp.float32)).astype(x.dtype)


class SelfAttentionLayer(nn.Module):
    """Post-norm self-attention (reference ``mask_attention.py:9-64``)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        tgt_key_padding_mask: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
    ) -> jax.Array:
        qk = tgt if query_pos is None else tgt + query_pos
        tgt2, _ = TorchMHA(self.d_model, self.nhead, name="self_attn")(
            qk, qk, tgt, key_padding_mask=tgt_key_padding_mask)
        tgt = tgt + tgt2
        return LayerNorm(name="norm")(tgt)


class CrossAttentionLayer(nn.Module):
    """Post-norm cross-attention returning the attention matrix
    (reference ``mask_attention.py:67-137``)."""

    d_model: int
    nhead: int

    @nn.compact
    def __call__(
        self,
        tgt: jax.Array,
        memory: jax.Array,
        memory_mask: Optional[jax.Array] = None,
        memory_key_padding_mask: Optional[jax.Array] = None,
        pos: Optional[jax.Array] = None,
        query_pos: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        q = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        tgt2, atten = TorchMHA(self.d_model, self.nhead, name="multihead_attn")(
            q, k, memory, attn_mask=memory_mask, key_padding_mask=memory_key_padding_mask)
        tgt = tgt + tgt2
        return LayerNorm(name="norm")(tgt), atten


class FFNLayer(nn.Module):
    """Post-norm FFN (reference ``mask_attention.py:140-180``)."""

    d_model: int
    dim_feedforward: int = 2048
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tgt: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.dim_feedforward, name="linear1", dtype=tgt.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(tgt)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.d_model, name="linear2", dtype=tgt.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        tgt = tgt + x
        return LayerNorm(name="norm")(tgt)
