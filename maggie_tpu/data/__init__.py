"""Dataset registry (reference ``maggie/dataloader/__init__.py``)."""

from __future__ import annotations

from typing import Any


def build_dataset(cfg: Any, is_train: bool, random_seed: int = 2023):
    sub = cfg.dataset.train if is_train else cfg.dataset.test
    name = sub.name
    if name == "HIM":
        from .him import HIMDataset
        return HIMDataset(
            root_dir=sub.root_dir,
            split=sub.split,
            is_train=is_train,
            random_seed=random_seed,
            **{k: v for k, v in sub.items() if k not in ("name", "root_dir", "split")},
        )
    if name == "VIM":
        from .vim import VIMDataset
        return VIMDataset(
            root_dir=sub.root_dir,
            split=sub.split,
            is_train=is_train,
            random_seed=random_seed,
            **{k: v for k, v in sub.items() if k not in ("name", "root_dir", "split")},
        )
    raise KeyError(f"Unknown dataset '{name}'")
