"""HIM image instance-matting dataset (reference ``maggie/dataloader/him.py``).

Directory contract (reference ``docs/DATASET.md:68-107``):
- train:  root/images/<split>/*.jpg + root/<alpha_dir>/<split>/<image>/<inst>.png
- test:   root/<split>/images/*.jpg + root/<split>/<alpha_dir>/<image>/*.png
  (+ optional root/<split>/<mask_dir>/<image>/*.png guidance masks)

Emits numpy sample dicts:
  image (T, H, W, 3) normalized float32; mask (T, n_i, h', w') in [0,1];
  alpha (T, n_i, H, W) in [0,1]; train adds transition; eval adds trimap,
  image_names, alpha_names, transform_info, skip.
"""

from __future__ import annotations

import glob
import logging
import os

import cv2
import numpy as np

from . import transforms as T
from .utils import gen_transition_gt

logger = logging.getLogger(__name__)


class HIMDataset:
    def __init__(self, root_dir, split, max_inst=10, short_size=768, is_train=False,
                 random_seed=2023, crop=(512, 512), padding_crop_p=0.1, flip_p=0.5,
                 gamma_p=0.3, add_noise_p=0.3, jpeg_p=0.1, affine_p=0.1,
                 binarized_kernel=30, downscale_mask_p=0.5, downscale_mask=True,
                 alpha_dir_name="alphas", mask_dir_name="",
                 device_preprocess=False, cache_images=0.0, **kwargs):
        self.root_dir = root_dir
        self.split = split
        self.alpha_dir_name = alpha_dir_name
        self.mask_dir_name = mask_dir_name
        self.is_train = is_train
        self.short_size = short_size
        self.max_inst = max_inst
        # train: reference couples this to downscale_mask_p (him.py:27); eval: config flag
        self.downscale_mask = (downscale_mask_p > 0) if is_train else downscale_mask
        # jit the frame/mask preprocessing tail on device (eval with a mask dir
        # only; the host cv2 chain remains the parity reference)
        self.device_preprocess = bool(device_preprocess and not is_train
                                      and mask_dir_name)
        self.random = np.random.RandomState(random_seed)

        # NOTE the reference's helper names are swapped relative to use
        # (him.py:31-34): EVAL reads root/images/<split>, TRAIN reads
        # root/<split>/images (docs/DATASET.md:68-107)
        if is_train:
            self._index_split_first()
        else:
            self._index_images_first()

        tf = [
            T.Load(cache_gb=float(cache_images)),
            T.ResizeShort(short_size, transform_alphas=is_train),
            T.PaddingMultiplyBy(64, transform_alphas=is_train),
            T.Stack(),
        ]
        if is_train:
            tf += [
                T.RandomCropByAlpha(crop, self.random, padding_prob=padding_crop_p),
                T.RandomHorizontalFlip(self.random, flip_p),
                T.GammaContrast(self.random, p=gamma_p),
                T.AdditiveGaussianNoise(self.random, p=add_noise_p),
                T.JpegCompression(self.random, p=jpeg_p),
                T.RandomAffine(self.random, p=affine_p),
                T.RandomBinarizedMask(self.random, binarized_kernel),
                T.DownUpMask(self.random, 0.125, downscale_mask_p),
                T.CutMask(self.random),
            ]
        elif self.mask_dir_name == "":
            tf += [T.GenMaskFromAlpha(), T.DownUpMask(self.random, 0.125, 1.0)]
        tf += [T.ToNumpy(), T.Normalize()]
        self.transforms = T.Compose(tf)

    def _index_images_first(self):
        """root/images/<split>/*.jpg + root/<alpha_dir>/<split>/<image>/ — the EVAL
        layout (reference ``prepare_image_train``, him.py:67-80)."""
        images = sorted(glob.glob(os.path.join(self.root_dir, "images", self.split, "*.jpg")))
        data = []
        target = self.alpha_dir_name if self.mask_dir_name == "" else self.mask_dir_name
        for image in images:
            name = os.path.basename(image).replace(".jpg", "")
            adir = os.path.join(self.root_dir, target, self.split, name)
            if not os.path.isdir(adir):
                continue
            alphas = sorted(os.listdir(adir))
            data.append((image, [os.path.join(self.root_dir, self.alpha_dir_name, self.split, name, p)
                                 for p in alphas]))
        self.data = data

    def _index_split_first(self):
        """root/<split>/images/*.jpg + root/<split>/<alpha_dir>/<image>/ — the TRAIN
        layout (reference ``prepare_image_test``, him.py:82-89)."""
        images = sorted(glob.glob(os.path.join(self.root_dir, self.split, "images", "*.jpg")))
        data = []
        for image in images:
            name = os.path.basename(image).replace(".jpg", "")
            alphas = sorted(glob.glob(os.path.join(self.root_dir, self.split, self.alpha_dir_name, name, "*.png")))
            data.append((image, alphas))
        self.data = data

    def __len__(self):
        return len(self.data)

    def _getitem_device(self, image_path, alpha_paths, mask_paths):
        """Eval sample with the jit-compiled device preprocessing tail
        (``data/device_pipeline.py``): host work shrinks to decode + the
        metric-side alpha/trimap prep, which never leaves the exact host path."""
        from PIL import Image
        from .device_pipeline import device_preprocess_eval

        frame = np.array(Image.open(image_path).convert("RGB"))
        masks = np.stack([np.array(Image.open(p).convert("L"))
                          for p in mask_paths])
        image, mask, transform_info = device_preprocess_eval(
            frame, masks, self.short_size, 64, self.downscale_mask)

        alpha = np.stack([np.array(Image.open(p).convert("L"))
                          for p in alpha_paths])[None].astype(np.float32) / 255.0
        trans = gen_transition_gt(alpha[0, :, None])[:, 0][None]
        trimap = np.zeros_like(alpha)
        trimap[alpha > 0.5] = 2.0
        trimap[trans > 0] = 1.0
        return {
            "image": image, "mask": mask, "alpha": alpha, "trimap": trimap,
            "image_names": [image_path],
            "alpha_names": [os.path.basename(a) for a in alpha_paths],
            "transform_info": transform_info, "skip": 0,
        }

    def __getitem__(self, index):
        image_path, alphas = self.data[index]
        if len(alphas) > self.max_inst:
            alphas = list(self.random.choice(alphas, self.max_inst, replace=False))

        masks = None
        if self.is_train:
            masks = alphas
        elif self.mask_dir_name != "":
            masks = [a.replace(self.alpha_dir_name, self.mask_dir_name) for a in alphas]

        if self.device_preprocess:
            return self._getitem_device(image_path, alphas, masks)

        out_d = self.transforms({"frames": [image_path], "alphas": list(alphas), "masks": masks})
        image = out_d["frames"]            # (1, H, W, 3)
        alpha = out_d["alphas"]            # (1, n_i, H, W) 0..255
        mask = out_d["masks"]              # (1, n_i, H, W) 0..255 uint8
        transform_info = out_d["transform_info"]

        if self.is_train:
            # drop tiny instances (< 0.1% area, reference him.py:120-135)
            valid = (alpha > 127).sum((-1, -2)) > (0.001 * alpha.shape[-1] * alpha.shape[-2])
            keep = np.nonzero(valid[0])[0]
            if len(keep) == 0:
                logger.warning("Mask empty after removing tiny instances; resampling")
                return self[self.random.randint(0, len(self.data))]
            alpha = alpha[:, keep]
            mask = mask[:, keep]

            # random instance drop 5% (him.py:138-149)
            if alpha.shape[1] > 1 and self.random.rand() < 0.05:
                ids = self.random.choice(alpha.shape[1], alpha.shape[1] - 1, replace=False)
                alpha, mask = alpha[:, ids], mask[:, ids]

        if not self.is_train:
            alpha = out_d["ori_alphas"]

        if self.is_train and mask.sum() == 0:
            logger.warning("Mask is empty; resampling")
            return self[self.random.randint(0, len(self.data))]

        alpha = alpha.astype(np.float32) / 255.0
        mask = mask.astype(np.float32) / 255.0

        if self.is_train and self.max_inst - alpha.shape[1] > 0:
            # scatter instances into random slots of max_inst (him.py:159-174)
            new_alpha = np.zeros((1, self.max_inst, *alpha.shape[2:]), np.float32)
            new_mask = np.zeros((1, self.max_inst, *mask.shape[2:]), np.float32)
            ids = self.random.choice(self.max_inst, alpha.shape[1], replace=False)
            new_alpha[:, ids] = alpha
            new_mask[:, ids] = mask
            alpha, mask = new_alpha, new_mask

        if self.downscale_mask:
            h8, w8 = image.shape[1] // 8, image.shape[2] // 8
            small = np.stack([
                np.stack([cv2.resize(m, (w8, h8), interpolation=cv2.INTER_NEAREST) for m in inst])
                for inst in mask])
            mask = small

        out = {"image": image, "mask": mask.astype(np.float32), "alpha": alpha.astype(np.float32)}

        if self.is_train:
            k_size = int(self.random.choice(range(2, 5)))
            iterations = int(self.random.randint(5, 15))
            trans = gen_transition_gt(alpha[0, :, None], mask[0, :, None],
                                      k_size=k_size, iterations=iterations)
            out["transition"] = trans[None, :, 0].astype(np.float32)
        else:
            trans = gen_transition_gt(alpha[0, :, None])
            trans = trans[:, 0][None]
            trimap = np.zeros_like(alpha)
            trimap[alpha > 0.5] = 2.0
            trimap[trans > 0] = 1.0
            out.update({
                "trimap": trimap,
                "image_names": [image_path],
                "alpha_names": [os.path.basename(a) for a in alphas],
                "transform_info": transform_info,
                "skip": 0,
            })
        return out
