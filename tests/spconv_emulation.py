"""Pure-torch emulation of the spconv-2.x API surface the reference uses.

Purpose: an INDEPENDENT oracle for the flagship spconv decoder. The reference's
``maggie/network/decoder/resnet_inst_matt_spconv.py`` imports
``spconv.pytorch``; spconv-cu120 needs CUDA and cannot run here. This module
implements the five symbols that file touches (``SparseConvTensor``,
``SubMConv2d``, ``SparseConv2d``, ``SparseInverseConv2d``,
``SparseSequential``) in plain torch, derived from spconv's documented
rulebook algorithm — NOT from this repo's JAX code — so running the
reference's decoder against it is a genuine cross-check of the JAX ladder.

Semantics implemented (spconv 2.x):

- Weight layout is KRSC: ``(out_channels, kh, kw, in_channels)`` — what
  spconv-2.x state_dicts store and what ``maggie_tpu.utils.convert_torch
  .spconv_w`` assumes.
- ``SparseConv2d`` (stride s, padding p, correlation convention, matching
  torch ``nn.Conv2d``): output site ``o`` receives input site ``i`` through
  kernel tap ``k`` iff ``i = o*s - p + k`` elementwise, ``0 <= k < K``. The
  active output set is every in-bounds ``o`` reachable from >= 1 active
  input. The (i, o, k) triplets are the *rulebook*; it is stored under
  ``indice_key`` exactly like spconv's ``indice_dict``.
- ``SubMConv2d``: output sites == input sites; the same tap relation with
  s=1 and the kernel centered (``p = k//2``); spconv ignores the declared
  padding for submanifold pair generation (the reference's
  ``SubMConv2d(..., kernel_size=1, padding=1)`` at
  ``resnet_inst_matt_spconv.py:95`` relies on this).
- ``SparseInverseConv2d(indice_key=...)``: reuses the stored rulebook with
  gather/scatter roles swapped and the SAME kernel-tap enumeration:
  ``out[i] += W[k] @ y[o]`` for every stored ``(i, o, k)``. This makes it
  the adjoint (transpose) of the paired forward conv — functionally a
  masked dense ``conv_transpose2d`` with an unflipped kernel, which is the
  orientation ``test_sparse_layers.py`` verifies against torch.
- ``BatchNorm1d`` / activations inside ``SparseSequential`` apply to
  ``.features`` — spconv's SparseSequential behavior.

Everything is CPU float32 and deliberately simple (python loops over the
<= 25 kernel taps, vectorized over sites).
"""

from __future__ import annotations

import math

import torch
from torch import nn


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size,
                 indice_dict=None):
        self.features = features                # (n_active, C)
        self.indices = indices                  # (n_active, 3) int32 [b, y, x]
        self.spatial_shape = tuple(spatial_shape)
        self.batch_size = int(batch_size)
        self.indice_dict = {} if indice_dict is None else indice_dict

    def replace_feature(self, feats):
        return SparseConvTensor(feats, self.indices, self.spatial_shape,
                                self.batch_size, self.indice_dict)

    def dense(self):
        h, w = self.spatial_shape
        c = self.features.shape[1]
        out = self.features.new_zeros(self.batch_size, c, h, w)
        idx = self.indices.long()
        out[idx[:, 0], :, idx[:, 1], idx[:, 2]] = self.features
        return out


def _site_grid(indices, batch_size, h, w):
    """Dense (B, H, W) lookup: grid[b, y, x] = row index into the site list,
    -1 where inactive."""
    grid = torch.full((batch_size, h, w), -1, dtype=torch.long)
    idx = indices.long()
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = torch.arange(idx.shape[0])
    return grid


class _SparseConvBase(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, indice_key=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.indice_key = indice_key
        # KRSC layout, kaiming-uniform like torch convs (any init works for the
        # parity tests — both sides load the same converted state_dict)
        w = torch.empty(out_channels, kernel_size, kernel_size, in_channels)
        nn.init.kaiming_uniform_(w, a=math.sqrt(5))
        self.weight = nn.Parameter(w)
        if bias:
            fan_in = in_channels * kernel_size ** 2
            bound = 1.0 / math.sqrt(fan_in)
            self.bias = nn.Parameter(torch.empty(out_channels).uniform_(-bound, bound))
        else:
            self.register_parameter("bias", None)


class SubMConv2d(_SparseConvBase):
    """Submanifold conv: output sites == input sites, centered taps."""

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        idx = x.indices.long()
        h, w = x.spatial_shape
        grid = _site_grid(x.indices, x.batch_size, h, w)
        n = idx.shape[0]
        out = x.features.new_zeros(n, self.out_channels)
        half = self.kernel_size // 2
        for kh in range(self.kernel_size):
            for kw in range(self.kernel_size):
                sy = idx[:, 1] + kh - half
                sx = idx[:, 2] + kw - half
                ok = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
                src = torch.full((n,), -1, dtype=torch.long)
                src[ok] = grid[idx[ok, 0], sy[ok], sx[ok]]
                m = src >= 0
                if m.any():
                    out[m] += x.features[src[m]] @ self.weight[:, kh, kw, :].T
        if self.bias is not None:
            out = out + self.bias
        return x.replace_feature(out)


class SparseConv2d(_SparseConvBase):
    """Strided sparse conv; stores its rulebook under ``indice_key``."""

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        idx = x.indices.long()
        h, w = x.spatial_shape
        k, s, p = self.kernel_size, self.stride, self.padding
        ho = (h + 2 * p - k) // s + 1
        wo = (w + 2 * p - k) // s + 1

        # collect (input row, output position) pairs per kernel tap:
        # i = o*s - p + k  =>  o = (i + p - k) / s when divisible and in range
        tap_pairs = []
        out_pos_chunks = []
        for kh in range(k):
            for kw in range(k):
                ty = idx[:, 1] + p - kh
                tx = idx[:, 2] + p - kw
                ok = (ty % s == 0) & (tx % s == 0)
                oy, ox = ty // s, tx // s
                ok &= (oy >= 0) & (oy < ho) & (ox >= 0) & (ox < wo)
                rows = ok.nonzero(as_tuple=True)[0]
                opos = idx[rows, 0] * (ho * wo) + oy[rows] * wo + ox[rows]
                tap_pairs.append((kh, kw, rows, opos))
                out_pos_chunks.append(opos)

        all_pos = torch.unique(torch.cat(out_pos_chunks))
        out_indices = torch.stack([
            all_pos // (ho * wo),
            (all_pos % (ho * wo)) // wo,
            all_pos % wo,
        ], dim=1).to(torch.int32)
        pos_to_row = torch.full((x.batch_size * ho * wo,), -1, dtype=torch.long)
        pos_to_row[all_pos] = torch.arange(all_pos.shape[0])

        out = x.features.new_zeros(all_pos.shape[0], self.out_channels)
        rulebook = []                       # (kh, kw, fine_rows, coarse_rows)
        for kh, kw, rows, opos in tap_pairs:
            orows = pos_to_row[opos]
            out[orows] += x.features[rows] @ self.weight[:, kh, kw, :].T
            rulebook.append((kh, kw, rows, orows))
        if self.bias is not None:
            out = out + self.bias

        indice_dict = dict(x.indice_dict)
        if self.indice_key is not None:
            indice_dict[self.indice_key] = {
                "fine_indices": x.indices,
                "fine_shape": x.spatial_shape,
                "coarse_indices": out_indices,
                "rulebook": rulebook,
            }
        return SparseConvTensor(out, out_indices, (ho, wo), x.batch_size,
                                indice_dict)


class SparseInverseConv2d(_SparseConvBase):
    """Adjoint of the paired SparseConv2d: same rulebook, roles swapped."""

    def __init__(self, in_channels, out_channels, kernel_size, bias=True,
                 indice_key=None):
        super().__init__(in_channels, out_channels, kernel_size, bias=bias,
                         indice_key=indice_key)
        assert indice_key is not None

    def forward(self, y: SparseConvTensor) -> SparseConvTensor:
        book = y.indice_dict[self.indice_key]
        coarse = book["coarse_indices"]
        assert torch.equal(y.indices.long(), coarse.long()), (
            "inverse conv input sites must be the paired conv's output sites "
            "in stored order")
        fine_indices = book["fine_indices"]
        out = y.features.new_zeros(fine_indices.shape[0], self.out_channels)
        for kh, kw, fine_rows, coarse_rows in book["rulebook"]:
            out[fine_rows] += y.features[coarse_rows] @ self.weight[:, kh, kw, :].T
        if self.bias is not None:
            out = out + self.bias
        return SparseConvTensor(out, fine_indices, book["fine_shape"],
                                y.batch_size, y.indice_dict)


class SparseModule(nn.Module):
    pass


class SparseSequential(nn.Sequential):
    """Applies sparse modules to the tensor, plain modules to .features."""

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        for m in self:
            if isinstance(m, (_SparseConvBase, SparseSequential, SparseModule)):
                x = m(x)
            else:
                x = x.replace_feature(m(x.features))
        return x
