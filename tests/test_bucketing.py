"""Eval shape bucketing: canonical-bucket math and pad/crop equivalence."""

import numpy as np
import jax.numpy as jnp

from maggie_tpu.engine.test import _bucket_dims, _pad_to_bucket


def test_bucket_dims():
    assert _bucket_dims(576, 960, 3) == (576, 1024, 3)
    assert _bucket_dims(576, 1024, 5) == (576, 1024, 6)
    assert _bucket_dims(577, 1025, 11) == (640, 1152, 11)  # beyond buckets: exact n_i
    assert _bucket_dims(64, 128, 2) == (64, 128, 2)        # small inputs unchanged
    assert _bucket_dims(96, 160, 1) == (128, 192, 1)  # non-x64 H rounds up


def test_pad_to_bucket_shapes_and_crop():
    rs = np.random.RandomState(0)
    h, w, n_i = 96, 160, 2
    batch = {
        "image": jnp.asarray(rs.rand(1, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(1, 1, n_i, h // 8, w // 8) > 0.5).astype(np.float32)),
    }
    hb, wb, nb = _bucket_dims(h, w, n_i)
    padded = _pad_to_bucket(batch, hb, wb, nb)
    assert padded["image"].shape == (1, 1, hb, wb, 3)
    assert padded["mask"].shape == (1, 1, nb, hb // 8, wb // 8)
    # original content preserved; padding zero
    np.testing.assert_array_equal(np.asarray(padded["image"])[:, :, :h, :w], np.asarray(batch["image"]))
    np.testing.assert_array_equal(np.asarray(padded["mask"])[:, :, :n_i, :h // 8, :w // 8],
                                  np.asarray(batch["mask"]))
    assert float(jnp.sum(padded["image"][:, :, h:])) == 0.0
    assert float(jnp.sum(padded["mask"][:, :, n_i:])) == 0.0


def test_dummy_eval_bucketing_equivalence():
    """Dummy arch: bucketed forward + crop == direct forward (the crop fully
    removes the padding's influence for a mask-passthrough model)."""
    import jax
    from maggie_tpu.config import load_config
    from maggie_tpu.models import build_model

    cfg = load_config()
    cfg.model.arch = "Dummy"
    model = build_model(cfg.model)
    rs = np.random.RandomState(1)
    h, w, n_i = 96, 160, 2
    batch = {
        "image": jnp.asarray(rs.rand(1, 1, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray((rs.rand(1, 1, n_i, h // 8, w // 8) > 0.5).astype(np.float32)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    direct = model.apply(variables, batch, train=False)["refined_masks"]
    hb, wb, nb = _bucket_dims(h, w, n_i)
    padded = _pad_to_bucket(batch, hb, wb, nb)
    bucketed = model.apply(variables, padded, train=False)["refined_masks"]
    np.testing.assert_array_equal(np.asarray(bucketed)[:, :, :n_i, :h, :w],
                                  np.asarray(direct))
