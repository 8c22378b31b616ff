"""Instance-mask segmenters feeding the demo (reference ``demo/maskrcnn.py``,
``demo/xmem_processor.py``, ``demo/samurai_processor.py``).

The reference chains external models in front of MaGGIe: ONNX MaskRCNN for
image instance proposals, XMem or SAM2/Samurai for video mask propagation.
Here that chain is a CODE interface with four backends:

- ``MaskFileSegmenter`` — masks the user already has (what the external
  models would produce). Works everywhere, today.
- ``MaskRCNNOnnxSegmenter`` — full pre/post-processing of the public
  MaskRCNN-10 ONNX model (mirrors ``demo/maskrcnn.py:7-44,47-77``); needs
  ``onnxruntime`` + the model file and raises with the exact recipe when
  either is missing.
- ``XMemPropagator`` / ``Sam2Propagator`` — video mask propagation plug
  points; their upstream repos/weights are not redistributable here, so they
  raise with the recipe (clone + checkpoint path), exactly delimiting what a
  user must supply.
"""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np
from PIL import Image


class ImageSegmenter(Protocol):
    def segment(self, image: Image.Image) -> tuple[Image.Image, np.ndarray]:
        """Returns (visualization, label_map) — label_map HxW uint8 with
        0 = background, 1..n = instance ids."""


class VideoPropagator(Protocol):
    def propagate(self, frames: list[Image.Image],
                  first_mask: np.ndarray) -> list[np.ndarray]:
        """Propagates the first frame's label map to every frame."""


def label_map_to_instances(label_map: np.ndarray) -> list[np.ndarray]:
    """0/255 binary mask per instance id, the MaGGIe guidance format
    (reference ``demo/maggie_predictor.py:36-44``)."""
    ids = np.unique(label_map)
    return [((label_map == i) * 255).astype(np.uint8) for i in ids if i != 0]


def _overlay(image: Image.Image, label_map: np.ndarray) -> Image.Image:
    rs = np.random.RandomState(0)
    img = np.array(image.convert("RGB")).astype(np.float32)
    for i in np.unique(label_map):
        if i == 0:
            continue
        color = rs.randint(64, 255, 3).astype(np.float32)
        m = (label_map == i)[..., None]
        img = np.where(m, 0.5 * img + 0.5 * color, img)
    return Image.fromarray(img.astype(np.uint8))


class MaskFileSegmenter:
    """Masks from files: one label-map PNG, or one binary PNG per instance."""

    def __init__(self, mask_paths: list[str]):
        self.mask_paths = mask_paths

    def segment(self, image):
        arrs = [np.array(Image.open(p).convert("L")) for p in self.mask_paths]
        if len(arrs) == 1 and len(np.unique(arrs[0])) > 2:
            label_map = arrs[0]
        else:
            label_map = np.zeros_like(arrs[0])
            for i, a in enumerate(arrs):
                label_map[a > 127] = i + 1
        return _overlay(image, label_map), label_map


class MaskRCNNOnnxSegmenter:
    """MaskRCNN-10 ONNX human-instance proposals (``demo/maskrcnn.py``)."""

    MODEL = "MaskRCNN-10.onnx"
    RECIPE = (
        "MaskRCNN backend needs: (1) `pip install onnxruntime`; (2) the model "
        "file MaskRCNN-10.onnx next to demo/app.py — "
        "https://github.com/onnx/models/tree/main/validated/vision/"
        "object_detection_segmentation/mask-rcnn (the reference wgets the same "
        "file, demo/maskrcnn.py:41-42). Then re-run."
    )

    def __init__(self, model_path: str | None = None,
                 score_threshold: float = 0.7):
        self.score_threshold = score_threshold
        path = model_path or os.path.join(os.path.dirname(__file__), self.MODEL)
        try:
            import onnxruntime as rt
        except ImportError as e:
            raise RuntimeError(self.RECIPE) from e
        if not os.path.exists(path):
            raise RuntimeError(self.RECIPE)
        self.sess = rt.InferenceSession(path, providers=["CPUExecutionProvider"])

    @staticmethod
    def _preprocess(image: Image.Image) -> np.ndarray:
        # reference demo/maskrcnn.py:7-32: resize short side to 800, BGR,
        # CHW, caffe mean subtraction, pad /32
        ratio = 800.0 / min(image.size)
        img = image.resize((int(ratio * image.size[0]),
                            int(ratio * image.size[1])), Image.BILINEAR)
        x = np.array(img)[:, :, [2, 1, 0]].astype(np.float32)
        x = np.transpose(x, (2, 0, 1))
        x -= np.array([102.9801, 115.9465, 122.7717], np.float32)[:, None, None]
        ph = -(-x.shape[1] // 32) * 32
        pw = -(-x.shape[2] // 32) * 32
        out = np.zeros((3, ph, pw), np.float32)
        out[:, :x.shape[1], :x.shape[2]] = x
        return out

    def segment(self, image):
        import cv2
        x = self._preprocess(image)
        boxes, labels, scores, masks = self.sess.run(
            None, {self.sess.get_inputs()[0].name: x})
        ratio = 800.0 / min(image.size)
        boxes = boxes / ratio
        w, h = image.size
        label_map = np.zeros((h, w), np.uint8)
        inst = 0
        # reference demo/maskrcnn.py:47-77: person class only, paste each
        # 28x28 mask into its box, threshold 0.5
        for mask, box, label, score in zip(masks, boxes, labels, scores):
            if label != 1 or score <= self.score_threshold:
                continue
            inst += 1
            x0, y0, x1, y1 = box
            x0, y0 = int(max(round(x0), 0)), int(max(round(y0), 0))
            x1, y1 = int(min(round(x1), w - 1)), int(min(round(y1), h - 1))
            if x1 <= x0 or y1 <= y0:
                continue
            m = cv2.resize(mask[0], (x1 - x0 + 1, y1 - y0 + 1),
                           interpolation=cv2.INTER_LINEAR) > 0.5
            region = label_map[y0:y1 + 1, x0:x1 + 1]
            region[m & (region == 0)] = inst
        return _overlay(image, label_map), label_map


class FlowPropagator:
    """Offline-working video mask propagation: Farneback dense optical flow
    (cv2, no learned weights) warps the first frame's label map forward frame
    by frame via backward sampling + nearest remap.

    Fills the role XMem/SAM2 play in the reference demo (``demo/app.py:35-43``)
    with what this box can run today; the learned propagators remain available
    as plug-in backends below for users who have their weights. Accuracy is
    what classical flow gives — solid on moderate motion, no re-detection on
    occlusion — which is exactly the guidance-quality regime MaGGIe is built
    to refine (degraded masks, reference ``tools/gen_mask``)."""

    def __init__(self, pyr_scale: float = 0.5, levels: int = 4,
                 winsize: int = 21, iterations: int = 5):
        self.params = dict(pyr_scale=pyr_scale, levels=levels, winsize=winsize,
                           iterations=iterations, poly_n=5, poly_sigma=1.1,
                           flags=0)

    def propagate(self, frames, first_mask):
        import cv2
        grays = [cv2.cvtColor(np.array(f.convert("RGB")), cv2.COLOR_RGB2GRAY)
                 for f in frames]
        h, w = grays[0].shape
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        out = [first_mask.astype(np.uint8)]
        for t in range(1, len(grays)):
            # flow from frame t BACK to t-1: for each target pixel, where it
            # came from — lets us pull labels with one nearest-neighbour remap
            flow = cv2.calcOpticalFlowFarneback(grays[t], grays[t - 1], None,
                                                **self.params)
            warped = cv2.remap(out[-1], gx + flow[..., 0], gy + flow[..., 1],
                               interpolation=cv2.INTER_NEAREST,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
            # close pinholes the flow field opens inside instances
            warped = cv2.morphologyEx(
                warped, cv2.MORPH_CLOSE,
                cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5)))
            out.append(warped)
        return out


class _SubprocessPropagator:
    """Shared wiring for the learned propagators: the reference shells out to a
    processor script in the external model's own environment
    (``demo/app.py:35-43``); here the exchange is an explicit directory
    protocol (frames + first_mask in, per-frame label maps out) driven by a
    worker script, so the external repo/weights/python are all configurable:

    - ``<NAME>_DIR``     env (or ctor arg): the upstream repo checkout
    - ``<NAME>_WEIGHTS`` env (or ctor arg): the checkpoint path
    - ``<NAME>_PYTHON``  env: python executable of the repo's venv
      (defaults to this interpreter)

    Missing repo/weights raise the setup recipe, exactly delimiting what a
    user must supply."""

    NAME = ""        # env prefix
    WORKER = ""      # worker script next to this file
    RECIPE = ""

    def __init__(self, repo_dir: str | None = None,
                 weights: str | None = None):
        self.repo_dir = repo_dir or os.environ.get(f"{self.NAME}_DIR", "")
        self.weights = weights or os.environ.get(f"{self.NAME}_WEIGHTS", "")
        self.python = os.environ.get(f"{self.NAME}_PYTHON", "") or None
        if not (self.repo_dir and os.path.isdir(self.repo_dir)
                and self.weights and os.path.exists(self.weights)):
            raise RuntimeError(self.RECIPE)

    def propagate(self, frames, first_mask):
        import shutil
        import subprocess
        import sys
        import tempfile
        exchange = tempfile.mkdtemp(prefix=f"{self.NAME.lower()}_exchange_")
        try:
            fdir = os.path.join(exchange, "frames")
            os.makedirs(fdir)
            names = [f"{t:05d}.png" for t in range(len(frames))]
            for name, frame in zip(names, frames):
                frame.convert("RGB").save(os.path.join(fdir, name))
            Image.fromarray(first_mask.astype(np.uint8)).save(
                os.path.join(exchange, "first_mask.png"))
            worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  self.WORKER)
            # generous bound (model load + ~10 s/frame) so a hung external
            # worker cannot block the demo forever
            timeout = float(os.environ.get(f"{self.NAME}_TIMEOUT_S",
                                           600 + 10 * len(frames)))
            try:
                r = subprocess.run(
                    [self.python or sys.executable, worker, exchange,
                     self.repo_dir, self.weights],
                    capture_output=True, text=True, timeout=timeout)
            except subprocess.TimeoutExpired as exc:
                raise RuntimeError(
                    f"{self.WORKER} exceeded {timeout:.0f}s on "
                    f"{len(frames)} frames") from exc
            if r.returncode != 0:
                raise RuntimeError(
                    f"{self.WORKER} failed (rc={r.returncode}):\n{r.stderr[-2000:]}")
            out = []
            for name in names:
                p = os.path.join(exchange, "masks",
                                 os.path.splitext(name)[0] + ".png")
                if not os.path.exists(p):
                    raise RuntimeError(f"{self.WORKER} produced no mask for {name}")
                out.append(np.array(Image.open(p).convert("L")))
            return out
        finally:
            shutil.rmtree(exchange, ignore_errors=True)


class XMemPropagator(_SubprocessPropagator):
    NAME = "XMEM"
    WORKER = "xmem_worker.py"
    RECIPE = (
        "XMem propagation needs the upstream repo + checkpoint: "
        "`git clone https://github.com/hkchengrex/XMem` and XMem.pth "
        "(https://github.com/hkchengrex/XMem/releases/download/v1.0/XMem.pth — "
        "the reference wgets the same file, demo/xmem_processor.py:18-19). "
        "Point XMEM_DIR at the checkout, XMEM_WEIGHTS at the .pth (and "
        "XMEM_PYTHON at its venv's python if separate), then re-run. "
        "Alternatively feed externally-produced masks via MaskFileSegmenter / "
        "the mask-directory input."
    )


class Sam2Propagator(_SubprocessPropagator):
    NAME = "SAM2"
    WORKER = "sam2_worker.py"
    RECIPE = (
        "SAM2/Samurai propagation needs the upstream sam2 (or samurai) "
        "package + checkpoint (the reference vendors a patched sam2_base.py "
        "and runs demo/samurai_processor.py, demo/app.py:40-43). Point "
        "SAM2_DIR at the repo (the dir containing the `sam2` package), "
        "SAM2_WEIGHTS at the checkpoint, and SAM2_PYTHON at its venv's python "
        "if separate, then re-run. Alternatively feed externally-produced "
        "masks via MaskFileSegmenter / the mask-directory input."
    )
