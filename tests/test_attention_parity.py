"""Parity of TorchMHA / attention layers vs torch.nn.MultiheadAttention."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from maggie_tpu.models.attention import TorchMHA, CrossAttentionLayer


def _np(seed, *shape):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32) * 0.3


def test_mha_matches_torch_with_masks():
    E, H, L, S, B = 32, 4, 5, 13, 2
    tm = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    q, k, v = (_np(i, L if i == 0 else S, B, E) for i in range(3))
    attn_mask = np.random.RandomState(7).rand(B, L, S) > 0.7
    # keep at least one allowed key per query (torch NaNs otherwise)
    attn_mask[..., 0] = False
    kpm = np.zeros((B, S), bool)
    kpm[:, -2:] = True

    with torch.no_grad():
        # torch 3D attn_mask is (B*H, L, S)
        am = torch.from_numpy(np.repeat(attn_mask, H, axis=0))
        ref_out, ref_w = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
                            attn_mask=am, key_padding_mask=torch.from_numpy(kpm))

    model = TorchMHA(E, H)
    params = {"params": {
        "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
        "out_proj_weight": jnp.asarray(tm.out_proj.weight.detach().numpy()),
        "out_proj_bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
    }}
    out, w = model.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         attn_mask=jnp.asarray(attn_mask), key_padding_mask=jnp.asarray(kpm))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w), ref_w.numpy(), atol=2e-5, rtol=1e-4)


def test_cross_attention_layer_matches_reference_math():
    """Cross layer: residual + post-norm, with positional embeds added to q/k only."""
    E, H, L, S, B = 16, 1, 3, 20, 2
    tm = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    ln = torch.nn.LayerNorm(E)
    tgt = _np(0, L, B, E)
    mem = _np(1, S, B, E)
    pos = _np(2, S, B, E)
    qpos = _np(3, L, B, E)
    with torch.no_grad():
        t2, ref_attn = tm(torch.from_numpy(tgt + qpos), torch.from_numpy(mem + pos),
                          torch.from_numpy(mem))
        ref = ln(torch.from_numpy(tgt) + t2)

    layer = CrossAttentionLayer(E, H)
    params = {"params": {
        "multihead_attn": {
            "in_proj_weight": jnp.asarray(tm.in_proj_weight.detach().numpy()),
            "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
            "out_proj_weight": jnp.asarray(tm.out_proj.weight.detach().numpy()),
            "out_proj_bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
        },
        "norm": {"ln": {"scale": jnp.asarray(ln.weight.detach().numpy()),
                        "bias": jnp.asarray(ln.bias.detach().numpy())}},
    }}
    out, attn = layer.apply(params, jnp.asarray(tgt), jnp.asarray(mem),
                            pos=jnp.asarray(pos), query_pos=jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(), atol=2e-5, rtol=1e-4)
