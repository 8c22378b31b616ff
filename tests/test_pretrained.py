"""maggie_tpu.from_pretrained — the reference's ``MaGGIe.from_pretrained``
public surface (``maggie/network/__init__.py:7-13``), exercised offline with a
converted-npz round trip."""

import numpy as np
import pytest


def test_from_pretrained_npz_roundtrip(tmp_path):
    import jax
    import maggie_tpu
    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model
    from maggie_tpu.utils.checkpoint import save_variables_npz

    cfg = load_config("configs/maggie_image.yaml")
    cfg.model.encoder_args.update(dict(num_embed=3, num_mask=3))
    cfg.model.decoder_args.update(dict(atten_dim=32, final_channel=32, max_inst=3))
    model = build_model(cfg.model)
    import jax.numpy as jnp
    dummy = {"image": jnp.zeros((1, 1, 64, 64, 3)),
             "mask": jnp.zeros((1, 1, 1, 8, 8))}
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy, train=False)
    p = tmp_path / "ckpt.npz"
    save_variables_npz(str(p), variables)

    model2, v2, cfg2 = maggie_tpu.from_pretrained(
        str(p), config=cfg, overrides={"model.precision": "bf16"})
    assert cfg2.model.precision == "bf16"
    assert cfg2.model.weights == str(p)
    # folded SN: spectral collection gone, weights reproduce the same forward
    assert "spectral" not in v2
    out1 = model.apply(variables, dummy, train=False)["refined_masks"]
    cfg_f32 = cfg.clone()
    model3, v3, _ = maggie_tpu.from_pretrained(str(p), config=cfg_f32)
    out2 = model3.apply(v3, dummy, train=False)["refined_masks"]
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_from_pretrained_unknown_id_errors():
    import maggie_tpu
    with pytest.raises(ValueError, match="model-zoo id"):
        maggie_tpu.from_pretrained("nobody/unknown-model")
