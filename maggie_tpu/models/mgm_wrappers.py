"""MGM_SingInst: inference-time per-instance loop over the MaGGIe harness
(reference ``arch/maggie.py:370-384``)."""

from __future__ import annotations

import jax.numpy as jnp

from .maggie import MaGGIe


class MGMSingInst(MaGGIe):
    def __call__(self, batch, train: bool = False, **kwargs):
        if train:
            return super().__call__(batch, train=True, **kwargs)
        masks = batch["mask"]
        n_i = masks.shape[2]
        outs = []
        for i in range(n_i):
            sub = dict(batch)
            sub["mask"] = masks[:, :, i:i + 1]
            outs.append(super().__call__(sub, train=False, **kwargs))
        return {k: jnp.concatenate([o[k] for o in outs], axis=2) for k in outs[0]}
