"""Checkpointing: best/last policy via orbax + shape-tolerant partial load.

Mirrors the reference artifacts (``engine/train.py:313-343``): ``best_model`` on val
improvement, ``last_model`` + optimizer/scheduler/iter/best_score for resume, and the
shape-tolerant partial loader that reports missing/unexpected/mismatched keys
(``engine/train.py:80-96``). Torch ``.pth`` checkpoints are converted through
``tools/convert_torch_ckpt.py``.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state: Any) -> None:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def partial_load(params: Any, loaded_flat: dict[tuple, np.ndarray]) -> Any:
    """Shape-tolerant partial load (reference ``load_state_dict``,
    ``engine/train.py:80-96``): copy matching keys with matching shapes, keep the
    rest, and log missing/unexpected/mismatched."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    missing, mismatched = [], []
    used = set()
    out = {}
    for k, v in flat.items():
        if k in loaded_flat:
            lv = np.asarray(loaded_flat[k])
            if tuple(lv.shape) == tuple(v.shape):
                out[k] = lv.astype(np.asarray(v).dtype)
                used.add(k)
            else:
                mismatched.append(("/".join(k), tuple(v.shape), tuple(lv.shape)))
                out[k] = v
        else:
            missing.append("/".join(k))
            out[k] = v
    unexpected = ["/".join(k) for k in loaded_flat if k not in used and k not in flat]
    if missing:
        logger.warning(f"Missing keys ({len(missing)}): {missing[:10]}...")
    if unexpected:
        logger.warning(f"Unexpected keys ({len(unexpected)}): {unexpected[:10]}...")
    if mismatched:
        logger.warning(f"Shape-mismatched keys: {mismatched[:10]}...")
    return unflatten_dict(out)


def load_model_weights(model, cfg, seed: int = 0) -> dict:
    """Build eval variables: from an orbax/npz checkpoint if ``cfg.model.weights``
    points at one, else fresh init (reference loads file-or-HF-hub,
    ``test.py:318-327``; HF hub is out of scope on this air-gapped box)."""
    import jax.numpy as jnp

    h = 64  # init shapes don't affect parameter shapes; keep the trace tiny
    n_f = int(cfg.dataset.test.get("clip_length", 1)) if cfg.dataset.test.name == "VIM" else 1
    dummy = {
        "image": jnp.zeros((1, n_f, h, h, 3), jnp.float32),
        "mask": jnp.zeros((1, n_f, 1, h // 8, h // 8), jnp.float32),
    }
    variables = model.init({"params": jax.random.PRNGKey(seed)}, dummy, train=False)
    weights = cfg.model.weights
    if not weights:
        logger.warning("No weights specified; using random init")
        return variables

    if weights.endswith(".npz"):
        from flax.traverse_util import flatten_dict, unflatten_dict
        data = np.load(weights, allow_pickle=False)
        loaded = {tuple(k.split("/")): v for k, v in data.items()}
        params_flat = {k[1:]: v for k, v in loaded.items() if k[0] == "params"}
        variables = dict(variables)
        variables["params"] = partial_load(variables["params"], params_flat)
        for coll in ("batch_stats", "spectral"):
            coll_flat = {k[1:]: v for k, v in loaded.items() if k[0] == coll}
            if coll_flat and coll in variables:
                variables[coll] = partial_load(variables[coll], coll_flat)
        logger.info(f"Loaded weights from {weights}")
        return variables

    if weights.endswith((".pth", ".pt", ".bin", ".ckpt")) and os.path.isfile(weights):
        variables = dict(variables)
        variables.update(_load_torch_file(weights, cfg, variables))
        return variables

    if os.path.isdir(weights):
        # HF-snapshot layout (the reference's from_pretrained cache dir):
        # pytorch_model.bin / model.safetensors (+ config.json)
        for cand in ("pytorch_model.bin", "model.safetensors", "model.pth"):
            p = os.path.join(weights, cand)
            if os.path.isfile(p):
                variables = dict(variables)
                variables.update(_load_torch_file(p, cfg, variables))
                return variables
        restored = restore_checkpoint(weights, variables)
        logger.info(f"Restored orbax checkpoint from {weights}")
        return restored

    if "/" in weights and not os.path.exists(weights):
        # Hub id, the reference's MaGGIe.from_pretrained('chuonghm/...')
        # (network/__init__.py:7-13). Try the hub if importable/online.
        try:
            from huggingface_hub import snapshot_download
            local = snapshot_download(weights)
            import copy
            cfg2 = copy.deepcopy(cfg)  # don't mutate the caller's cfg.model.weights
            cfg2.model.weights = local
            return load_model_weights(model, cfg2, seed)
        except Exception as e:
            raise FileNotFoundError(
                f"Cannot fetch hub checkpoint {weights!r} ({e}). Offline recipe: "
                f"download pytorch_model.bin elsewhere, then point model.weights "
                f"at the file/directory, or pre-convert with "
                f"tools/convert_torch_ckpt.py") from e

    raise FileNotFoundError(f"Cannot load weights from {weights!r}: expected an "
                            f".npz (use tools/convert_torch_ckpt.py), a torch "
                            f".pth/.bin/.safetensors, an HF snapshot dir, an "
                            f"orbax dir, or a hub id")


def _load_torch_file(path: str, cfg, variables: dict) -> dict:
    """Convert a torch state_dict (file or HF snapshot member) in-process and
    partial-load it into ``variables`` (reference loads torch checkpoints
    natively; parity via maggie_tpu.utils.convert_torch)."""
    from .convert_torch import convert

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        try:
            sd = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # weights_only=False unpickles arbitrary objects — only fall back for
            # files the user pointed at explicitly, and say so.
            logger.warning(
                f"{path}: not loadable with weights_only=True; falling back to "
                f"full unpickling. Only do this for checkpoints you trust.")
            sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        sd = {k: v.numpy() for k, v in sd.items()}

    video = cfg.model.arch in ("MaGGIe_Temp",)
    flat = convert(sd, video=video,
                   n_block=int(cfg.model.decoder_args.get("atten_block", 2)),
                   decoder=cfg.model.decoder)
    loaded = {tuple(k.split("/")): np.asarray(v) for k, v in flat.items()}
    out = {}
    for coll in ("params", "batch_stats", "spectral"):
        coll_flat = {k[1:]: v for k, v in loaded.items() if k[0] == coll}
        if coll_flat and coll in variables:
            out[coll] = partial_load(variables[coll], coll_flat)
    logger.info(f"Converted + loaded torch checkpoint {path}")
    return out


def fold_spectral_norm(variables: dict) -> dict:
    """Inference-time spectral-norm folding: weight_bar := weight_bar / sigma with
    sigma = u @ W @ v, then DROP the 'spectral' collection — SN modules detect the
    absence and skip the per-forward sigma math (the reference instead runs a
    power iteration on every forward, even in eval: ``spectral_norm.py:73-80``)."""
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    if "spectral" not in variables:
        return variables
    params = flatten_dict(variables["params"])
    spectral = flatten_dict(variables["spectral"])
    out = dict(params)
    for k, w in params.items():
        if k[-1] != "weight_bar":
            continue
        ukey = k[:-1] + ("u",)
        vkey = k[:-1] + ("v",)
        if ukey not in spectral:
            continue
        # stay on device: host round-trips here would re-upload the whole tree
        u = jnp.asarray(spectral[ukey], jnp.float32)
        v = jnp.asarray(spectral[vkey], jnp.float32)
        w_j = jnp.asarray(w, jnp.float32)
        # reshape consistent with the stored u length (covers both conv layouts)
        if u.shape[0] == w_j.shape[-1]:  # SNConv: (kh,kw,I,O) -> (O, I*kh*kw)
            w_mat = jnp.transpose(w_j, (3, 2, 0, 1)).reshape(u.shape[0], -1)
        else:  # SNConvTranspose: (kh,kw,I,O) -> (I, O*kh*kw)
            w_mat = jnp.transpose(w_j, (2, 3, 0, 1)).reshape(u.shape[0], -1)
        sigma = u @ (w_mat @ v)
        out[k] = (w_j / sigma).astype(w.dtype)
    folded = dict(variables)
    folded["params"] = unflatten_dict(out)
    folded.pop("spectral")
    return folded


def save_variables_npz(path: str, variables: dict) -> None:
    from flax.traverse_util import flatten_dict
    out = {}
    for coll, tree in variables.items():
        for k, v in flatten_dict(tree).items():
            out["/".join((coll,) + k)] = np.asarray(v)
    np.savez(path, **out)
