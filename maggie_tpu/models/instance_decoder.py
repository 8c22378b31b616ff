"""Instance-query attention decoder — the core MaGGIe op.

Rebuilds reference ``maggie/network/module/instance_matte_decoder.py``: learnable
instance query tokens + a shared ID-embedding table painted onto both tokens and
feature-map positions (``:150-173``), n_block rounds of (token<-feat cross-attn, FFN,
token self-attn, feat<-token cross-attn) (``:219-249``), a final token<-feat
cross-attn (``:256-261``), training-time attention supervision (``:192-206``,
``compute_atten_loss`` ``:101-109``), optional temporal PE and a ConvGRU memory hook,
and the token·feature einsum producing per-instance mattes (``:302``).

Sequence layout matches the reference exactly: the memory sequence is (h*w, n_f)
flattened with the FRAME index fastest (``:177-178``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import CrossAttentionLayer, FFNLayer, SelfAttentionLayer
from .layers import BatchNorm, Conv, MLP
from .position_encoding import temporal_position_embedding_sine
from ..ops.resize import avg_pool2d, resize_any_shape


class InstanceMatteDecoder(nn.Module):
    input_dim: int = 256
    atten_stride: float = 1.0
    attention_dim: int = 256
    n_block: int = 2
    n_head: int = 4
    output_dim: int = 32
    return_feat: bool = True
    max_inst: int = 10
    use_temp_pe: bool = True
    use_id_pe: bool = True

    @nn.compact
    def __call__(
        self,
        ori_feat: jax.Array,           # (b*n_f, h, w, c) NHWC
        mask: jax.Array,               # (b, n_f, n_i, hm, wm) guidance masks
        use_mask_atten: bool = True,
        gt_mask: Optional[jax.Array] = None,
        aggregate_mem_fn: Optional[Callable] = None,
        train: bool = False,
    ):
        # reference PE split (``position_encoding.py:69-70``): spatial = C//8*3 each,
        # temporal = remainder; temporal channels only exist when use_temp_pe
        spatial_feats = self.attention_dim // 8 * 3
        n_temp_embed = (self.attention_dim - spatial_feats * 2) if self.use_temp_pe else 0
        n_id_embed = self.attention_dim - n_temp_embed

        dt = ori_feat.dtype  # compute dtype follows the activations (bf16 under AMP)
        feat = ori_feat
        if self.atten_stride > 1.0:
            s = int(self.atten_stride)
            nhw = jnp.transpose(feat, (0, 3, 1, 2))
            nhw = avg_pool2d(nhw, s, s)
            feat = jnp.transpose(nhw, (0, 2, 3, 1))
            ori_feat = Conv(self.attention_dim, (1, 1), (1, 1), (0, 0), use_bias=False,
                            name="ori_feat_proj")(ori_feat)

        b, n_f = mask.shape[:2]
        h, w = feat.shape[1], feat.shape[2]
        scale_factor = w * 1.0 / mask.shape[-1]
        if scale_factor < 1.0:
            mask = resize_any_shape(mask, scale_factor=scale_factor, use_avg_pool_binary=True)

        # ---- positional embeddings ----
        temp_feat_pos = None
        if n_temp_embed > 0:
            # (b, C, n_f, 1, 1) -> broadcast over h, w, keep first n_temp channels
            pe = temporal_position_embedding_sine(b, n_f, 1, 1, self.attention_dim)
            pe = jnp.broadcast_to(pe, (b, self.attention_dim, n_f, 1, 1))
            temp_feat_pos = jnp.broadcast_to(pe, (b, self.attention_dim, n_f, h, w))[:, :n_temp_embed]

        id_table = nn.Embed(self.max_inst + 1, n_id_embed,
                            embedding_init=nn.initializers.xavier_uniform(), name="id_embedding")
        # paint instance IDs onto the feature map: max over instances of mask*id
        n_i_in = mask.shape[2]
        mask_ids = jnp.arange(1, n_i_in + 1, dtype=mask.dtype)[None, None, :, None, None]
        id_map = jnp.max(mask * mask_ids, axis=2).astype(jnp.int32)  # (b, n_f, h, w)
        id_feat_pos = id_table(id_map)  # (b, n_f, h, w, c_id)
        id_feat_pos = jnp.transpose(id_feat_pos, (0, 4, 1, 2, 3))  # (b, c_id, n_f, h, w)

        if temp_feat_pos is not None:
            feat_pos = jnp.concatenate([id_feat_pos, temp_feat_pos.astype(id_feat_pos.dtype)], axis=1)
        else:
            feat_pos = id_feat_pos  # (b, c_atten_or_id, n_f, h, w)
        feat_pos = feat_pos.astype(dt)

        # ---- tokens ----
        query_feat = self.param("query_feat", nn.initializers.xavier_uniform(),
                                (self.max_inst, self.attention_dim)).astype(dt)
        tokens = jnp.broadcast_to(query_feat[None], (b, self.max_inst, self.attention_dim))

        id_token_pos = id_table(jnp.arange(1, self.max_inst + 1))  # (max_inst, c_id)
        id_token_pos = jnp.broadcast_to(id_token_pos[None], (b, self.max_inst, n_id_embed))
        if temp_feat_pos is not None:
            # reference ``:170``: temporal part taken from frame PEs at pixel (0,0);
            # all frames collapse onto the token axis by repetition over max_inst
            temp_token = temp_feat_pos[:, :, :, 0, 0]  # (b, c_temp, n_f)
            temp_token = jnp.transpose(temp_token, (0, 2, 1))[:, :, None, :]  # (b, n_f, 1, c_temp)
            temp_token = jnp.broadcast_to(temp_token, (b, n_f, self.max_inst, n_temp_embed))
            token_pos_bnfic = jnp.concatenate(
                [jnp.broadcast_to(id_token_pos[:, None], (b, n_f, self.max_inst, n_id_embed)), temp_token],
                axis=-1)  # (b, n_f, max_inst, c)
            token_pos = token_pos_bnfic.reshape(b, n_f * self.max_inst, self.attention_dim)
            # reference flattens (n_f, max_inst) onto the token axis only when temp PE
            # is active; with n_f collapsed below we keep (b, max_inst, c) for n_f==1.
            token_pos = token_pos_bnfic[:, 0]
        else:
            token_pos = id_token_pos  # (b, max_inst, c)

        # ---- sequence layout: (h*w*n_f, b, c), frame index fastest ----
        # feat (b*n_f, h, w, c) -> (b, n_f, h*w, c) -> (h*w, n_f, b, c) -> (hw*n_f, b, c)
        feat_seq = feat.reshape(b, n_f, h * w, feat.shape[-1])
        feat_seq = jnp.transpose(feat_seq, (2, 1, 0, 3)).reshape(h * w * n_f, b, feat.shape[-1])
        fp = feat_pos  # (b, c, n_f, h, w)
        fp = jnp.transpose(fp, (3, 4, 2, 0, 1)).reshape(h * w * n_f, b, self.attention_dim)

        feat_seq = MLP(self.attention_dim, self.attention_dim, 1, name="feat_proj")(feat_seq)

        n_i = self.max_inst
        tokens = jnp.transpose(tokens, (1, 0, 2))       # (n_i, b, c)
        token_pos_seq = jnp.transpose(token_pos, (1, 0, 2)).astype(dt)  # (n_i, b, c)

        # ---- attention masks ----
        atten_padding_m = None
        guidance_mask = None
        if train:
            gm = gt_mask if not use_mask_atten else mask
            if gm is not None:
                if not use_mask_atten and gm.shape[-1] != w:
                    gm = resize_any_shape(gm, scale_factor=w * 1.0 / gm.shape[-1], use_max_pool=True)
                # (b, n_f, n_i_in, h, w) -> (n_f*b, n_i_in, h*w)
                g = jnp.transpose(gm, (1, 0, 2, 3, 4)).reshape(n_f * b, gm.shape[2], h * w)
                if g.shape[1] < n_i:
                    g = jnp.concatenate(
                        [g, jnp.zeros((n_f * b, n_i - g.shape[1], h * w), g.dtype)], axis=1)
                g = g > 0
                guidance = g
                invalid = jnp.sum(g, axis=-1) == 0
                padding = jnp.where(invalid[:, :, None], True, g)  # invalid inst attends everywhere
                padding = ~padding
                # (n_f, b, n_i, hw) -> (b, n_i, hw, n_f) -> (b, n_i, hw*n_f)
                padding = padding.reshape(n_f, b, n_i, h * w)
                atten_padding_m = jnp.transpose(padding, (1, 2, 3, 0)).reshape(b, n_i, h * w * n_f)
                guidance = guidance.reshape(n_f, b, n_i, h * w)
                guidance_mask = jnp.transpose(guidance, (1, 2, 3, 0)).reshape(b, n_i, h * w * n_f).astype(jnp.float32)

        # token padding: instances with empty input mask are masked out of self-attn
        valid_tokens = jnp.sum(mask, axis=(1, 3, 4)) > 0  # (b, n_i_in)
        if valid_tokens.shape[1] < n_i:
            valid_tokens = jnp.concatenate(
                [valid_tokens, jnp.zeros((b, n_i - valid_tokens.shape[1]), bool)], axis=1)
        token_padding_mask = ~valid_tokens  # (b, n_i) True = pad

        def atten_loss(atten_mat):
            # reference ``compute_atten_loss`` (:101-109): atten_mat (b, n_i, S)
            vals = jnp.sum(guidance_mask * atten_mat, axis=2)
            gt = jnp.where(jnp.sum(guidance_mask, axis=2) == 0, 0.0, 1.0)
            return jnp.sum(gt - vals) / (n_f * b)

        max_loss = 0.0
        fp_or_none = fp if self.use_id_pe else None
        tp_or_none = token_pos_seq if self.use_id_pe else None

        for i in range(self.n_block):
            tokens, atten_mat = CrossAttentionLayer(self.attention_dim, self.n_head,
                                                    name=f"token_feat_ca_{i}")(
                tokens, feat_seq,
                memory_mask=atten_padding_m if use_mask_atten else None,
                pos=fp_or_none, query_pos=tp_or_none)
            if train and not use_mask_atten and guidance_mask is not None:
                max_loss += atten_loss(atten_mat)
            tokens = FFNLayer(self.attention_dim, self.attention_dim, name=f"mlp_{i}")(
                tokens, deterministic=not train)
            tokens = SelfAttentionLayer(self.attention_dim, self.n_head, name=f"sa_{i}")(
                tokens, tgt_key_padding_mask=token_padding_mask, query_pos=token_pos_seq)
            feat_seq, _ = CrossAttentionLayer(self.attention_dim, self.n_head,
                                              name=f"feat_token_ca_{i}")(
                feat_seq, tokens,
                memory_key_padding_mask=token_padding_mask,
                pos=tp_or_none, query_pos=fp_or_none)

        tokens, atten_mat = CrossAttentionLayer(self.attention_dim, self.n_head,
                                                name="final_token_feat_ca")(
            tokens, feat_seq,
            memory_mask=atten_padding_m if use_mask_atten else None,
            pos=fp, query_pos=token_pos_seq)
        if train and not use_mask_atten and guidance_mask is not None:
            max_loss += atten_loss(atten_mat)
        max_loss = max_loss / (self.n_block + 1)

        # ---- back to maps ----
        # (hw*n_f, b, c) -> (h, w, n_f, b, c) -> (b*n_f, h, w, c)
        fm = feat_seq.reshape(h, w, n_f, b, self.attention_dim)
        fm = jnp.transpose(fm, (3, 2, 0, 1, 4)).reshape(b * n_f, h, w, self.attention_dim)

        if self.atten_stride > 1.0:
            from ..ops.resize import resize_bilinear_nhwc
            fm = resize_bilinear_nhwc(fm, (fm.shape[1] * int(self.atten_stride),
                                           fm.shape[2] * int(self.atten_stride)), align_corners=True)
            fm = ori_feat + fm

        # ONE conv stack shared across both applications (reference self.conv,
        # instance_matte_decoder.py:81-88 applied at :287-290)
        conv_a = Conv(self.attention_dim, (3, 3), (1, 1), (1, 1), use_bias=False, name="conv_0")
        bn_a = BatchNorm(name="conv_bn0")
        conv_b = Conv(self.output_dim, (1, 1), (1, 1), (0, 0), use_bias=False, name="conv_1")
        bn_b = BatchNorm(name="conv_bn1")

        def smooth_conv(z):
            z = nn.leaky_relu(bn_a(conv_a(z), train), 0.2)
            return nn.leaky_relu(bn_b(conv_b(z), train), 0.2)

        hidden_state = None
        if aggregate_mem_fn is not None:
            no_temp = fm
            fm5 = fm.reshape(b, n_f, h, w, self.attention_dim)
            fm5, hidden_state = aggregate_mem_fn(fm5)
            fm_mem = fm5.reshape(b * n_f, h, w, self.attention_dim)
            out_feat = smooth_conv(no_temp)
            fm_out = smooth_conv(fm_mem)
        else:
            fm_out = smooth_conv(fm)
            out_feat = fm_out

        # ---- kernel MLP + matte einsum ----
        tk = MLP(self.attention_dim, self.output_dim, 1, name="final_mlp")(tokens)  # (n_i, b, c_out)
        tk = jnp.transpose(tk, (1, 0, 2))  # (b, n_i, c_out)
        tk = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(tk)

        fm_btchw = fm_out.reshape(b, n_f, h, w, self.output_dim)
        output_mask = jnp.einsum("bqc,bthwc->btqhw", tk.astype(fm_btchw.dtype), fm_btchw,
                                 preferred_element_type=jnp.float32)
        output_mask = output_mask.reshape(b * n_f, n_i, h, w)

        if self.return_feat:
            return output_mask, out_feat, tk, max_loss, hidden_state
        return output_mask, max_loss
