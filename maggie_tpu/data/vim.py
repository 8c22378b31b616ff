"""VIM video instance-matting dataset (reference ``maggie/dataloader/vim.py``).

Clip indexing: train takes every start with step ``clip_length-1``; eval slides
overlapping windows (``clip_length=3, overlap=2`` in the production config) and
emits ``is_first``/``is_last``/``skip`` flags for the streaming fusion
(``vim.py:79-97,198-209``).
"""

from __future__ import annotations

import glob
import logging
import os

import numpy as np

from . import transforms as T
from .utils import gen_diff_mask, gen_transition_gt

logger = logging.getLogger(__name__)


class VIMDataset:
    def __init__(self, root_dir, split, clip_length=8, clip_overlap=2, overlap=None,
                 max_step_size=5, max_inst=10, is_train=False, short_size=576,
                 crop=(512, 512), mask_dir_name="", alpha_dir_name="pha",
                 padding_crop_p=0.1, flip_p=0.5, gamma_p=0.3, motion_p=0.3,
                 add_noise_p=0.3, jpeg_p=0.1, affine_p=0.1, binarized_kernel=30,
                 random_seed=2023, downscale_mask_p=0.5, cache_images=0.0,
                 device_preprocess=False, **kwargs):
        self.root_dir = os.path.join(root_dir, split)
        self.short_size = short_size
        # jit device preprocessing tail for eval clips with a mask dir (mirrors
        # HIMDataset; the host cv2 chain remains the parity reference)
        self.device_preprocess = bool(device_preprocess and not is_train
                                      and mask_dir_name)
        self.is_train = is_train
        self.clip_length = clip_length
        self.overlap = clip_overlap if overlap is None else overlap
        self.max_inst = max_inst
        self.mask_dir_name = mask_dir_name
        self.alpha_dir_name = alpha_dir_name
        self.max_step_size = max_step_size
        self.random = np.random.RandomState(random_seed)

        self.video_infos: dict[str, list[str]] = {}
        self.frame_ids: list[tuple[str, int]] = []
        self._load_frame_ids(clip_length - 1 if is_train else self.overlap)

        tf = [T.Load(cache_gb=float(cache_images)),
              T.ResizeShort(short_size, transform_alphas=is_train),
              T.PaddingMultiplyBy(64, transform_alphas=is_train), T.Stack()]
        if is_train:
            tf += [
                T.RandomCropByAlpha(crop, self.random, padding_prob=padding_crop_p),
                T.RandomHorizontalFlip(self.random, flip_p),
                T.GammaContrast(self.random, p=gamma_p),
                T.MotionBlur(self.random, p=motion_p),
                T.AdditiveGaussianNoise(self.random, p=add_noise_p),
                T.JpegCompression(self.random, p=jpeg_p),
                T.RandomAffine(self.random, p=affine_p),
            ]
        if is_train or self.mask_dir_name == "":
            tf.append(T.GenMaskFromAlpha(1.0))
        if is_train:
            tf += [
                T.RandomBinarizedMask(self.random, binarize_max_k=binarized_kernel),
                T.DownUpMask(self.random, 0.125, downscale_mask_p),
                T.CutMask(self.random),
                T.MaskDropout(self.random),
            ]
        elif self.mask_dir_name == "":
            tf.append(T.DownUpMask(self.random, 0.125, 1.0))
        tf += [T.ToNumpy(), T.Normalize()]
        self.transforms = T.Compose(tf)

    def _load_frame_ids(self, overlap):
        fg_dir = os.path.join(self.root_dir, self.alpha_dir_name)
        for video_name in sorted(os.listdir(fg_dir)):
            frame_names = sorted(os.listdir(os.path.join(self.root_dir, "fgr", video_name)))
            self.video_infos[video_name] = frame_names
            start = 0
            upper = (len(frame_names) - self.clip_length + 1 if self.is_train
                     else len(frame_names) - overlap)
            while start < upper:
                self.frame_ids.append((video_name, start))
                start += self.clip_length - overlap

    def __len__(self):
        return len(self.frame_ids)

    def _getitem_device(self, video_name, start, frame_paths, alpha_paths, mask_paths):
        """Eval clip with the jit device preprocessing tail
        (``data/device_pipeline.py``): host keeps decode + the metric-side
        alpha/trimap prep (which never leaves the exact host path); image/mask
        resize+pad+normalize run under jit. VIM eval does not downscale masks."""
        import jax.numpy as jnp
        from PIL import Image

        from .device_pipeline import device_preprocess_eval

        n_f = len(frame_paths)
        n_i = len(alpha_paths) // n_f
        images, masks_dev, info = [], [], None
        for t in range(n_f):
            frame = np.array(Image.open(frame_paths[t]).convert("RGB"))
            m = np.stack([np.array(Image.open(p).convert("L"))
                          for p in mask_paths[t * n_i:(t + 1) * n_i]])
            im, mk, info = device_preprocess_eval(frame, m, self.short_size, 64,
                                                  downscale_mask=False)
            images.append(im)
            masks_dev.append(mk)
        image = jnp.concatenate(images, axis=0)          # (T, Hp, Wp, 3)
        mask = jnp.concatenate(masks_dev, axis=0)        # (T, n_i, Hp, Wp)

        alpha = np.stack([np.array(Image.open(p).convert("L"))
                          for p in alpha_paths]).astype(np.float32) / 255.0
        alpha = alpha.reshape(n_f, n_i, *alpha.shape[1:])
        trans = gen_transition_gt(alpha.reshape(-1, *alpha.shape[2:])[:, None])
        trans = trans.reshape(alpha.shape)
        trimap = np.zeros_like(alpha)
        trimap[alpha > 0.5] = 2.0
        trimap[trans > 0] = 1.0
        return {
            "image": image, "mask": mask, "alpha": alpha, "trimap": trimap,
            "image_names": frame_paths,
            "transform_info": info,
            "skip": 0 if start == 0 else self.overlap,
            "is_first": int(start == 0),
            "is_last": int(start + self.clip_length >= len(self.video_infos[video_name])),
        }

    def __getitem__(self, idx):
        video_name, start = self.frame_ids[idx]
        frame_names = self.video_infos[video_name]
        if self.is_train:
            end = min(start + self.clip_length * self.random.randint(1, self.max_step_size + 1),
                      len(frame_names))
            clip_length = min(end - start, self.clip_length)
            chosen = sorted(np.random.choice(frame_names[start:end], clip_length, replace=False))
            if self.random.rand() > 0.5:
                chosen = chosen[::-1]
            frame_names = list(chosen)
        else:
            frame_names = frame_names[start:start + self.clip_length]

        frame_paths = [os.path.join(self.root_dir, "fgr", video_name, f) for f in frame_names]
        alpha_paths = []
        for f in frame_names:
            adir = f.replace(".jpg", "")
            paths = sorted(glob.glob(os.path.join(self.root_dir, self.alpha_dir_name,
                                                  video_name, adir, "*.png")))
            if len(paths) > self.max_inst:
                paths = paths[:self.max_inst]
            alpha_paths.extend(paths)

        # random instance drop 20% (vim.py:129-137)
        if self.is_train and self.random.rand() < 0.2:
            n_inst = len(alpha_paths) // len(frame_paths)
            if n_inst > 1:
                drop = self.random.randint(0, n_inst)
                alpha_paths = [p for j, p in enumerate(alpha_paths) if j % n_inst != drop]

        mask_paths = None
        if self.mask_dir_name != "" and not self.is_train:
            mask_paths = [p.replace(f"/{self.alpha_dir_name}/", f"/{self.mask_dir_name}/")
                          for p in alpha_paths]

        if self.device_preprocess:
            return self._getitem_device(video_name, start, frame_paths, alpha_paths,
                                        mask_paths)

        d = self.transforms({"frames": frame_paths, "alphas": alpha_paths, "masks": mask_paths})
        frames, alphas, masks = d["frames"], d["alphas"], d["masks"]

        if not self.is_train:
            alphas = d["ori_alphas"]

        if self.is_train and (masks.sum() == 0 or alphas.sum() == 0
                              or (masks.sum((1, 2, 3)) == 0).any()):
            logger.error(f"Mask or alpha is zero: {idx}")
            return self[self.random.randint(0, len(self))]

        if self.is_train and self.max_inst - alphas.shape[1] > 0:
            na = np.zeros((alphas.shape[0], self.max_inst, *alphas.shape[2:]), alphas.dtype)
            nm = np.zeros((alphas.shape[0], self.max_inst, *masks.shape[2:]), masks.dtype)
            ids = self.random.choice(self.max_inst, alphas.shape[1], replace=False)
            na[:, ids] = alphas
            nm[:, ids] = masks
            alphas, masks = na, nm

        transition_gt = None
        if self.is_train:
            k_size = int(self.random.choice(range(2, 5)))
            iterations = int(np.random.randint(3, 7))
            diff = (np.abs(alphas[1:].astype(np.float32) - alphas[:-1].astype(np.float32)) > 5)
            diff = diff.astype(np.uint8) * 255
            tg = gen_diff_mask(diff.reshape(-1, *diff.shape[2:])[:, None], k_size, iterations)
            tg = tg.reshape(diff.shape)
            tg = np.concatenate([np.ones_like(tg[:1]), tg], axis=0)
            tg = (tg.sum(1, keepdims=True) > 0)
            transition_gt = np.broadcast_to(tg, alphas.shape).astype(np.uint8)

        alphas = alphas.astype(np.float32) / 255.0
        masks = masks.astype(np.float32) / 255.0

        if self.is_train:
            # binary-preserving small-mask sanity check (vim.py:188-192): block max
            m = masks.reshape(-1, *masks.shape[2:])
            h8, w8 = m.shape[1] // 8 * 8, m.shape[2] // 8 * 8
            small = m[:, :h8, :w8].reshape(m.shape[0], h8 // 8, 8, w8 // 8, 8).max((2, 4))
            if small.sum() == 0:
                logger.error(f"Small masks is zero: {idx}")
                return self[self.random.randint(0, len(self))]

        out = {"image": frames, "mask": masks.astype(np.float32),
               "alpha": alphas.astype(np.float32)}
        if not self.is_train:
            trans = gen_transition_gt(alphas.reshape(-1, *alphas.shape[2:])[:, None])
            trans = trans.reshape(alphas.shape)
            trimap = np.zeros_like(alphas)
            trimap[alphas > 0.5] = 2.0
            trimap[trans > 0] = 1.0
            out.update({
                "trimap": trimap,
                "image_names": frame_paths,
                "transform_info": d["transform_info"],
                "skip": 0 if start == 0 else self.overlap,
                "is_first": int(start == 0),
                "is_last": int(start + self.clip_length >= len(self.video_infos[video_name])),
            })
        else:
            out["transition"] = transition_gt.astype(np.float32)
        return out
