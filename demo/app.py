"""Two-tab matting demo app (reference ``demo/app.py``).

Tab "image": segmenter (MaskRCNN-ONNX or user mask files) -> MaGGIe ->
per-instance green-screen composites. Tab "video": first-frame masks +
propagation (XMem/SAM2 plug points, or a per-frame mask directory) ->
streaming MaGGIe_Temp -> matte frames.

UI backend: Gradio when importable (the reference's stack); otherwise a
stdlib http.server fallback with the same two-tab flow, so the demo runs on
this box today. The segmenter boundary is code (``demo/segmenters.py``):
the mask-file backend works now, the external-model backends raise with
their exact setup recipes.

Usage:
  python demo/app.py --weights w.npz [--video-weights wv.npz]
      [--backend maskfile|maskrcnn] [--port 7860]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from predict import build, preprocess  # noqa: E402
from segmenters import (FlowPropagator, MaskFileSegmenter,  # noqa: E402
                        MaskRCNNOnnxSegmenter, Sam2Propagator, XMemPropagator,
                        label_map_to_instances)
from maggie_tpu.utils.postprocess import reverse_transform  # noqa: E402

_STATE: dict = {}


def _image_model(args):
    if "image_model" not in _STATE:
        _STATE["image_model"] = build(args.config or "configs/maggie_image.yaml",
                                      args.weights, video=False)
    return _STATE["image_model"]


def _video_model(args):
    if "video_model" not in _STATE:
        _STATE["video_model"] = build(
            args.video_config or "configs/maggie_video.yaml",
            args.video_weights or args.weights, video=True)
    return _STATE["video_model"]


def _matte_composites(image: Image.Image, alpha: np.ndarray) -> list[Image.Image]:
    """Green-screen composites per instance (reference
    ``maggie_predictor.py:70-78``)."""
    img = np.array(image.convert("RGB"))
    green = np.zeros_like(img)
    green[:, :, 1] = 255
    out = []
    for i in range(alpha.shape[0]):
        a = alpha[i][:, :, None]
        out.append(Image.fromarray((img * a + (1 - a) * green).astype(np.uint8)))
    return out


def inference_image(args, image: Image.Image, mask_files: list[str] | None):
    if mask_files:
        seg = MaskFileSegmenter(mask_files)
    else:
        seg = MaskRCNNOnnxSegmenter()  # raises with recipe if unavailable
    vis, label_map = seg.segment(image)
    inst_masks = label_map_to_instances(label_map)
    if not inst_masks:
        raise RuntimeError("No person detected!")
    model, variables = _image_model(args)
    batch, tinfo = preprocess([image], [inst_masks])
    out = model.apply(variables, batch, train=False)
    alpha = reverse_transform(np.asarray(out["refined_masks"]), tinfo)
    alpha[alpha <= 1 / 255] = 0.0
    alpha[alpha >= 254 / 255] = 1.0
    return vis, _matte_composites(image, alpha[0, 0])


def _propagated_masks(frames_dir, frame_names, masks_dir, propagator):
    """Per-frame instance-mask lists when ``masks_dir`` covers only the FIRST
    frame: run the chosen propagator (flow works offline; xmem/sam2 raise their
    recipes) over the whole sequence once, mirroring the reference's
    XMem/SAM2 preprocessing pass (``demo/app.py:35-43``)."""
    prop = {"flow": FlowPropagator, "xmem": XMemPropagator,
            "sam2": Sam2Propagator}[propagator]()
    frames = [Image.open(os.path.join(frames_dir, f)) for f in frame_names]
    mdir0 = (os.path.join(masks_dir, os.path.splitext(frame_names[0])[0])
             if masks_dir else "")
    if os.path.isdir(mdir0):
        first = [np.array(Image.open(os.path.join(mdir0, m)).convert("L"))
                 for m in sorted(os.listdir(mdir0))]
        label = np.zeros_like(first[0], dtype=np.uint8)
        for i, m in enumerate(first):
            label[(m > 127) & (label == 0)] = i + 1
        n = len(first)
    else:  # no masks at all: detect people on the first frame
        _, label = MaskRCNNOnnxSegmenter().segment(frames[0])
        n = int(label.max())
    label_maps = prop.propagate(frames, label)
    return [[((lm == i + 1) * 255).astype(np.uint8) for i in range(n)]
            for lm in label_maps]


def _mux_video(frame_paths: list[str], out_base: str, fps: int = 8) -> str | None:
    """Mux matte frames into a single video file (reference ffmpeg muxing,
    ``demo/app.py:73-78``). Preference order: the ffmpeg binary when present
    (reference parity), else cv2's MJPG AVI writer (no external binary), else a
    PIL animated GIF. Returns the written path, or None if every backend fails."""
    import shutil
    import subprocess
    if shutil.which("ffmpeg"):
        out = out_base + ".mp4"
        listing = out_base + "_frames.txt"
        # ffmpeg concat quoting: single-quoted path with embedded quotes
        # escaped as '\''; the demuxer ignores the duration of the LAST
        # listed entry, so the final frame is repeated to honor its period.
        q = lambda p: "'" + p.replace("'", r"'\''") + "'"  # noqa: E731
        with open(listing, "w") as f:
            f.writelines(f"file {q(p)}\nduration {1 / fps}\n" for p in frame_paths)
            f.write(f"file {q(frame_paths[-1])}\n")
        r = subprocess.run(["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i",
                            listing, "-pix_fmt", "yuv420p", out],
                           capture_output=True)
        if r.returncode == 0:
            return out
    try:
        import cv2
        first = np.array(Image.open(frame_paths[0]))
        h, w = first.shape[:2]
        out = out_base + ".avi"
        vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
        if vw.isOpened():
            for p in frame_paths:
                vw.write(np.array(Image.open(p).convert("RGB"))[:, :, ::-1])
            vw.release()
            return out
    except Exception:
        pass
    try:
        out = out_base + ".gif"
        ims = [Image.open(p).convert("RGB") for p in frame_paths]
        ims[0].save(out, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
        return out
    except Exception:
        return None


def inference_video(args, frames_dir: str, masks_dir: str | None,
                    propagator: str, out_dir: str):
    """Streaming video matting over a frame directory. ``masks_dir`` holds one
    subdir per frame with per-instance PNGs (what XMem/SAM2 would emit); if it
    covers only the first frame — or is absent entirely (MaskRCNN detects on
    frame 0) — the propagator backend fills in the rest (``flow`` runs offline
    today; xmem/sam2 raise their recipes). Returns ``(frame_paths, video_path)``
    where the frames are also muxed into one video file (reference
    ``demo/app.py:73-78``)."""
    model, variables = _video_model(args)
    frame_names = sorted(os.listdir(frames_dir))
    have_all = bool(masks_dir) and all(
        os.path.isdir(os.path.join(masks_dir, os.path.splitext(f)[0]))
        for f in frame_names)
    per_frame = (None if have_all else
                 _propagated_masks(frames_dir, frame_names, masks_dir, propagator))
    prev_pred = None
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for start in range(0, max(len(frame_names) - 2, 1)):
        clip = frame_names[start:start + 3]
        frames = [Image.open(os.path.join(frames_dir, f)) for f in clip]
        if per_frame is not None:
            inst = [per_frame[start + t] for t in range(len(clip))]
        else:
            inst = []
            for f in clip:
                mdir = os.path.join(masks_dir, os.path.splitext(f)[0])
                inst.append([np.array(Image.open(os.path.join(mdir, m)).convert("L"))
                             for m in sorted(os.listdir(mdir))])
        # videos shorter than the 3-frame clip window: pad by repeating the
        # last frame (only the real frames are written below)
        n_real = len(clip)
        while len(frames) < 3:
            frames.append(frames[-1])
            inst.append(inst[-1])
        batch, tinfo = preprocess(frames, inst)
        out = model.apply(variables, batch, train=False, prev_pred=prev_pred)
        refined = out["refined_masks"]
        prev_pred = refined[:, 1]
        alpha = reverse_transform(np.asarray(refined), tinfo)
        alpha[alpha <= 1 / 255] = 0.0
        alpha[alpha >= 254 / 255] = 1.0
        keep = (range(n_real) if start == max(len(frame_names) - 3, 0)
                else [0])
        for t in keep:
            comp = _matte_composites(frames[t], alpha[0, t])
            path = os.path.join(out_dir, f"{os.path.splitext(clip[t])[0]}.jpg")
            grid = np.concatenate([np.array(c) for c in comp], axis=1)
            Image.fromarray(grid).save(path)
            written.append(path)
    video = _mux_video(written, os.path.join(out_dir, "matte_video"))
    return written, video


# ------------------------------------------------------------------ gradio UI
def launch_gradio(args):
    import gradio as gr

    def img_fn(image, mask_files):
        paths = [f.name for f in mask_files] if mask_files else None
        try:
            vis, mattes = inference_image(args, image, paths)
        except RuntimeError as e:
            raise gr.Error(str(e))
        return vis, mattes

    demo_image = gr.Interface(
        img_fn,
        inputs=[gr.Image(type="pil", label="Input Image"),
                gr.File(label="Instance masks (optional; else MaskRCNN)",
                        file_count="multiple")],
        outputs=[gr.Image(type="pil", label="Segmentation mask"),
                 gr.Gallery(type="pil", label="Alpha Mattes")],
        description="Mask-guided instance matting (MaGGIe, TPU build).")

    def vid_fn(frames_dir, masks_dir, propagator):
        try:
            files, video = inference_video(args, frames_dir, masks_dir or None,
                                           propagator, tempfile.mkdtemp())
        except RuntimeError as e:
            raise gr.Error(str(e))
        return [Image.open(f) for f in files[:16]], video

    demo_video = gr.Interface(
        vid_fn,
        inputs=[gr.Textbox(label="Frames directory"),
                gr.Textbox(label="Masks directory (optional)"),
                gr.Radio(["flow", "xmem", "sam2"], value="flow",
                         label="Propagator")],
        outputs=[gr.Gallery(label="Matte composites"),
                 gr.File(label="Matte video")],
        description="Streaming video matting.")

    gr.TabbedInterface([demo_image, demo_video], tab_names=["image", "video"],
                       title="MaGGIe: Mask Guided Gradual Human Instance "
                             "Matting (TPU)").launch(
        server_port=args.port, share=False, debug=False)


# ------------------------------------------------------------ stdlib fallback
_PAGE = """<!doctype html><title>MaGGIe TPU demo</title>
<style>body{font-family:sans-serif;max-width:760px;margin:2em auto}
.tab{border:1px solid #ccc;padding:1em;margin:1em 0}</style>
<h2>MaGGIe: Mask Guided Gradual Human Instance Matting (TPU)</h2>
<div class=tab><h3>image</h3>
<form method=post action=/image enctype=multipart/form-data>
Image: <input type=file name=image required><br>
Instance masks (optional; else MaskRCNN backend):
<input type=file name=masks multiple><br>
<input type=submit value="Run matting"></form></div>
<div class=tab><h3>video</h3>
<form method=post action=/video>
Frames dir: <input name=frames size=40><br>
Masks dir (optional): <input name=masks size=40><br>
Propagator: <select name=prop><option>flow</option><option>xmem</option><option>sam2</option></select>
<input type=submit value="Run matting"></form></div>"""


def launch_http(args):
    import email
    import email.policy
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="text/html"):
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._send(200, _PAGE)

        def _parts(self):
            length = int(self.headers["Content-Length"])
            raw = self.rfile.read(length)
            msg = email.message_from_bytes(
                b"Content-Type: " + self.headers["Content-Type"].encode() +
                b"\r\n\r\n" + raw, policy=email.policy.default)
            return list(msg.iter_parts())

        def do_POST(self):
            try:
                if self.path == "/image":
                    image, mask_paths = None, []
                    tmp = tempfile.mkdtemp()
                    for p in self._parts():
                        payload = p.get_payload(decode=True)
                        if p.get_param("name", header="content-disposition") == "image":
                            image = Image.open(io.BytesIO(payload))
                        elif payload:
                            fp = os.path.join(tmp, p.get_filename() or "m.png")
                            open(fp, "wb").write(payload)
                            mask_paths.append(fp)
                    vis, mattes = inference_image(args, image, mask_paths or None)
                    row = np.concatenate(
                        [np.array(vis.convert("RGB"))] +
                        [np.array(m) for m in mattes], axis=1)
                    buf = io.BytesIO()
                    Image.fromarray(row).save(buf, "PNG")
                    self._send(200, buf.getvalue(), "image/png")
                elif self.path == "/video":
                    q = parse_qs(self.rfile.read(
                        int(self.headers["Content-Length"])).decode())
                    files, video = inference_video(
                        args, q["frames"][0],
                        (q.get("masks") or [None])[0] or None,
                        (q.get("prop") or ["flow"])[0], tempfile.mkdtemp())
                    self._send(200, "<br>".join(
                        ([f"video: {video}"] if video else []) + files))
                else:
                    self._send(404, "not found")
            except Exception as e:  # surface recipe errors in the browser
                self._send(500, f"<pre>{e}</pre>")

        def log_message(self, *a):
            pass

    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"maggie_tpu demo (stdlib UI, gradio not installed) on "
          f"http://localhost:{args.port}")
    srv.serve_forever()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="")
    ap.add_argument("--video-weights", default="")
    ap.add_argument("--config", default=None)
    ap.add_argument("--video-config", default=None)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    try:
        import gradio  # noqa: F401
        launch_gradio(args)
    except ImportError:
        launch_http(args)


if __name__ == "__main__":
    main()
