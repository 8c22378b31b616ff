"""Training visualization panel writer."""

import os

import numpy as np
import jax.numpy as jnp

from maggie_tpu.engine.vis import save_train_visualization


def test_save_train_visualization(tmp_path):
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(1, 1, 32, 48, 3).astype(np.float32) * 0.5),
        "mask": jnp.asarray((rs.rand(1, 1, 3, 4, 6) > 0.5).astype(np.float32)),
        "alpha": jnp.asarray(rs.rand(1, 1, 3, 32, 48).astype(np.float32)),
        "transition": jnp.asarray((rs.rand(1, 1, 3, 32, 48) > 0.7).astype(np.float32)),
    }
    output = {"refined_masks": jnp.asarray(rs.rand(1, 1, 3, 32, 48).astype(np.float32))}
    path = save_train_visualization(batch, output, 42, str(tmp_path))
    assert os.path.exists(path)
    import cv2
    img = cv2.imread(path)
    assert img is not None and img.shape == (32 * 3, 48 * 5, 3)
