"""Public one-call model loading — the reference's ``MaGGIe.from_pretrained``
surface (``maggie/network/__init__.py:7-13``, model zoo ids in
``docs/MODEL_ZOO.md``).

    model, variables, cfg = maggie_tpu.from_pretrained(
        "chuonghm/maggie-image-him50k-cvpr24")
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)

``weights`` may be a HuggingFace hub id (fetched when the hub is reachable),
a local torch ``.pth``/``.bin``/``.safetensors`` file or snapshot directory,
a converted ``.npz``, or an orbax checkpoint dir (``utils/checkpoint.py``).
Known zoo ids map to their tracked production configs; anything else needs an
explicit ``config=`` (path or loaded ConfigNode). Spectral norm is folded for
eval; pass ``fold_sn=False`` to keep the raw u/v buffers (training init)."""

from __future__ import annotations

import os
from typing import Any

_ZOO_CONFIGS = {
    # reference docs/MODEL_ZOO.md:8-9
    "chuonghm/maggie-image-him50k-cvpr24": "configs/maggie_image.yaml",
    "chuonghm/maggie-video-vim2k5-cvpr24": "configs/maggie_video.yaml",
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def from_pretrained(weights: str, config: Any = None, fold_sn: bool = True,
                    overrides: dict | None = None):
    """Returns ``(model, variables, cfg)`` ready for eval.

    ``overrides`` is a dict of dotted config overrides, e.g.
    ``from_pretrained(w, overrides={"model.precision": "bf16"})``.
    """
    from .config import ConfigNode, load_config
    from .models import build_model
    from .utils.checkpoint import fold_spectral_norm, load_model_weights

    if isinstance(config, ConfigNode):
        cfg = config.clone()
    else:
        path = config or _ZOO_CONFIGS.get(weights)
        if path is None:
            raise ValueError(
                f"{weights!r} is not a known model-zoo id "
                f"({sorted(_ZOO_CONFIGS)}); pass config= explicitly")
        if not os.path.isabs(path) and not os.path.exists(path):
            path = os.path.join(_REPO_ROOT, path)
        cfg = load_config(path)
    cfg.model.weights = weights
    if overrides:
        flat = []
        for k, v in overrides.items():
            flat += [k, str(v)]
        cfg.merge_from_list(flat)

    model = build_model(cfg.model)
    variables = load_model_weights(model, cfg)
    if fold_sn:
        variables = fold_spectral_norm(variables)
    return model, variables, cfg
