"""Subprocess wiring of the learned video propagators (XMem, SAM2/Samurai).

The reference shells out to processor scripts importing the external repos
(``/root/reference/demo/app.py:35-43``, ``xmem_processor.py``,
``samurai_processor.py``); the repos/weights are not redistributable here, so
these tests validate the COMPLETE wiring — exchange-directory serialization,
worker subprocess launch in a configurable environment, external-API call
sequence, label-map collection — against minimal FAKE packages exposing the
exact upstream APIs the workers consume. A user who points XMEM_DIR/SAM2_DIR
at the real checkouts exercises byte-for-byte the same code path.
"""

import os
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))


def _frames_and_mask(n=3, h=32, w=48):
    rs = np.random.RandomState(0)
    frames = [Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8))
              for _ in range(n)]
    label = np.zeros((h, w), np.uint8)
    label[4:14, 6:18] = 1
    label[18:30, 24:40] = 2
    return frames, label


@pytest.fixture()
def fake_xmem(tmp_path):
    """Minimal XMem package tree with the API surface xmem_worker.py uses
    (model.network.XMem, inference.inference_core.InferenceCore, the three
    interactive_utils helpers). Propagation is identity: the seeded mask's
    probabilities are returned for every frame."""
    root = tmp_path / "XMem"
    (root / "model").mkdir(parents=True)
    (root / "inference" / "interact").mkdir(parents=True)
    (root / "model" / "__init__.py").write_text("")
    (root / "inference" / "__init__.py").write_text("")
    (root / "inference" / "interact" / "__init__.py").write_text("")
    (root / "model" / "network.py").write_text(textwrap.dedent("""
        class XMem:
            def __init__(self, config, weights, map_location=None):
                assert config["top_k"] == 30  # the reference config reached us
                open(weights).close()  # weights path must exist
            def eval(self):
                return self
            def to(self, device):
                return self
    """))
    (root / "inference" / "inference_core.py").write_text(textwrap.dedent("""
        import torch
        class InferenceCore:
            def __init__(self, network, config):
                self.mask = None
            def set_all_labels(self, labels):
                self.labels = list(labels)
            def step(self, frame, mask=None):
                if mask is not None:
                    self.mask = mask  # (n_fg, H, W)
                bg = (1.0 - self.mask.sum(0, keepdim=True)).clamp(min=0)
                return torch.cat([bg, self.mask], 0)
    """))
    (root / "inference" / "interact" / "interactive_utils.py").write_text(
        textwrap.dedent("""
        import numpy as np
        import torch
        def image_to_torch(frame, device="cpu"):
            t = torch.from_numpy(frame.astype("float32") / 255).permute(2, 0, 1)
            return t, None
        def index_numpy_to_one_hot_torch(mask, n):
            oh = np.stack([(mask == i).astype("float32") for i in range(n)])
            return torch.from_numpy(oh)
        def torch_prob_to_numpy_mask(prob):
            return prob.argmax(0).numpy().astype("uint8")
    """))
    weights = tmp_path / "XMem.pth"
    weights.write_bytes(b"fake")
    return str(root), str(weights)


@pytest.fixture()
def fake_sam2(tmp_path):
    """Minimal sam2 package exposing build_sam2_video_predictor with the
    samurai streaming API (init_state / add_new_points_or_box /
    propagate_in_video). Each prompted bbox propagates as its filled
    rectangle on every frame."""
    root = tmp_path / "samurai_sam2"
    (root / "sam2").mkdir(parents=True)
    (root / "sam2" / "__init__.py").write_text("")
    (root / "sam2" / "build_sam.py").write_text(textwrap.dedent("""
        import os
        import torch
        class _Predictor:
            def init_state(self, frames_dir, offload_video_to_cpu=False):
                names = sorted(os.listdir(frames_dir))
                from PIL import Image
                w, h = Image.open(os.path.join(frames_dir, names[0])).size
                return {"n": len(names), "hw": (h, w), "prompts": {}}
            def add_new_points_or_box(self, state, box, frame_idx, obj_id):
                state["prompts"][obj_id] = box
                return None, None, None
            def propagate_in_video(self, state):
                h, w = state["hw"]
                for t in range(state["n"]):
                    ids, masks = [], []
                    for obj_id, (x0, y0, x1, y1) in state["prompts"].items():
                        m = torch.full((1, h, w), -1.0)
                        m[0, y0:y1 + 1, x0:x1 + 1] = 1.0
                        ids.append(obj_id)
                        masks.append(m)
                    yield t, ids, masks
        def build_sam2_video_predictor(cfg, ckpt, device="cpu"):
            assert "samurai" in cfg  # determine_model_cfg picked a samurai cfg
            open(ckpt).close()
            return _Predictor()
    """))
    weights = tmp_path / "sam2.1_hiera_base_plus.pt"
    weights.write_bytes(b"fake")
    return str(root), str(weights)


def test_xmem_wiring_roundtrip(fake_xmem):
    from segmenters import XMemPropagator
    repo, weights = fake_xmem
    prop = XMemPropagator(repo_dir=repo, weights=weights)
    frames, label = _frames_and_mask()
    out = prop.propagate(frames, label)
    assert len(out) == len(frames)
    for lm in out:  # fake XMem propagates the seed identically
        np.testing.assert_array_equal(lm, label)


def test_sam2_wiring_roundtrip(fake_sam2):
    from segmenters import Sam2Propagator
    repo, weights = fake_sam2
    prop = Sam2Propagator(repo_dir=repo, weights=weights)
    frames, label = _frames_and_mask()
    out = prop.propagate(frames, label)
    assert len(out) == len(frames)
    for lm in out:  # fake SAM2 fills each instance's prompt bbox
        assert set(np.unique(lm)) == {0, 1, 2}
        assert np.all(lm[4:14, 6:18] == 1)
        assert np.all(lm[18:30, 24:40] == 2)


def test_missing_setup_raises_recipe(monkeypatch):
    from segmenters import Sam2Propagator, XMemPropagator
    for var in ["XMEM_DIR", "XMEM_WEIGHTS", "SAM2_DIR", "SAM2_WEIGHTS"]:
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(RuntimeError, match="XMEM_DIR"):
        XMemPropagator()
    with pytest.raises(RuntimeError, match="SAM2_DIR"):
        Sam2Propagator()
