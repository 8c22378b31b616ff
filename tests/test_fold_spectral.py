"""Spectral-norm folding must be output-identical to the unfolded eval path."""

import numpy as np
import jax
import jax.numpy as jnp

from maggie_tpu.config import load_config
from maggie_tpu.models import build_model
from maggie_tpu.utils.checkpoint import fold_spectral_norm


def test_folded_eval_matches_unfolded():
    cfg = load_config("configs/maggie_image.yaml")
    cfg.model.decoder_args.atten_dim = 32
    cfg.model.decoder_args.final_channel = 32
    cfg.model.decoder_args.max_inst = 3
    cfg.model.encoder_args.num_mask = 3
    model = build_model(cfg.model)
    rs = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rs.rand(1, 1, 64, 64, 3).astype(np.float32)),
             "mask": jnp.asarray((rs.rand(1, 1, 2, 8, 8) > 0.5).astype(np.float32))}
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out_ref = model.apply(variables, batch, train=False)["refined_masks"]

    folded = fold_spectral_norm(jax.device_get(variables))
    assert "spectral" not in folded
    out_folded = model.apply(folded, batch, train=False)["refined_masks"]
    np.testing.assert_allclose(np.asarray(out_folded), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-4)
