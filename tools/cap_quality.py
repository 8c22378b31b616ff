"""Block-capacity vs quality on REALISTIC uncertainty bands (VERDICT r2 item 6).

The round-2 worst case (synthetic blobs with a ~29 px soft ramp) put cap 0.5 at
2e-3 MAD drift vs the oracle — above the 1e-3 budget. Real HIM scenes have far
thinner bands; this tool quantifies that with procedurally generated human-like
foreground alphas (elongated silhouettes + hair-like strands + occlusion, the
structure the I-HIM50K synthesizer composites from real data,
``tools/synthesize_image_him.py``):

1. alpha -> eval-mode ``compute_unknown`` (k=30) -> per-instance active masks
   (exactly the decoder's roi, ``models/decoder_sparse.py``);
2. for each capacity fraction: run the ladder's own ``select_blocks`` and
   report the fraction of active os8 sites in DROPPED blocks — the
   weight-independent determinant of block-vs-oracle drift (covered sites are
   bit-exact; dropped ones fall back to the os8 prediction).

Usage: python tools/cap_quality.py [n_scenes] [H] [W]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def procedural_alpha(seed: int, h: int, w: int, n_i: int | None = None):
    """(n_i, h, w) float alphas of occluding human-like figures: torso+head
    ellipse unions, a 1-4 px soft boundary, and partial-alpha hair strands."""
    import cv2
    rs = np.random.RandomState(seed)
    n_i = n_i or rs.randint(2, 5)
    alphas = []
    for j in range(n_i):
        m = np.zeros((h, w), np.float32)
        cx = int((j + 1) * w / (n_i + 1) + rs.randint(-w // 10, w // 10))
        top = rs.randint(h // 12, h // 4)
        body_w = rs.randint(w // 14, w // 7)
        head_r = max(body_w // 2, 6)
        # head + torso + legs as filled ellipses
        cv2.ellipse(m, (cx, top + head_r), (head_r, int(head_r * 1.2)),
                    0, 0, 360, 1.0, -1)
        cv2.ellipse(m, (cx, min(top + head_r * 3 + h // 5, h - 1)),
                    (body_w, h // 4), 0, 0, 360, 1.0, -1)
        cv2.ellipse(m, (cx - body_w // 2, min(top + head_r * 2 + h // 2, h - 1)),
                    (body_w // 3, h // 5), 0, 0, 360, 1.0, -1)
        cv2.ellipse(m, (cx + body_w // 2, min(top + head_r * 2 + h // 2, h - 1)),
                    (body_w // 3, h // 5), 0, 0, 360, 1.0, -1)
        # soft boundary: blur with a small random kernel (1-4 px ramp)
        k = rs.choice([3, 5, 7, 9])
        m = cv2.GaussianBlur(m, (k, k), 0)
        # hair strands: partial-alpha random walks from the head top
        n_strands = rs.randint(10, 40)
        for _ in range(n_strands):
            x = cx + rs.randint(-head_r, head_r)
            y = top
            a = rs.uniform(0.2, 0.8)
            for _ in range(rs.randint(8, 30)):
                if not (0 <= x < w and 0 <= y < h):
                    break
                m[y, x] = max(m[y, x], a)
                x += rs.randint(-1, 2)
                y -= rs.randint(0, 2)
        alphas.append(m)
    # occlusion-aware recomputation (synthesize_image_him.py:55-89 semantics:
    # later instances occlude earlier ones; here front-to-back order j=0 front)
    out = np.stack(alphas)
    acc = np.zeros((h, w), np.float32)
    for j in range(n_i):
        out[j] = out[j] * (1.0 - acc)
        acc = acc + out[j] * (1.0 - acc)
    return np.clip(out, 0.0, 1.0)


def main():
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    from maggie_tpu.models.sparse_layers import active_pyramid
    from maggie_tpu.ops.morphology import compute_unknown

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 576
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    caps = [0.3, 0.5, 0.7, 1.0]
    b1 = 64
    nb = (h // b1) * (w // b1)

    @jax.jit
    def scene_stats(alpha):
        unk = compute_unknown(alpha[None], k_size=30, is_train=False)[0]
        n = unk.shape[0]
        m1 = unk.reshape(n, h, w, 1)
        _, _, _, m8 = active_pyramid(m1)
        scores = (m8[..., 0].reshape(n, h // (8 * (b1 // 8)), b1 // 8,
                                     w // (8 * (b1 // 8)), b1 // 8)
                  .sum((2, 4)).reshape(-1))
        total = jnp.maximum(jnp.sum(scores), 1.0)
        active_frac = jnp.mean((scores > 0).astype(jnp.float32))
        out = []
        for cap_frac in caps:
            cap = max(int(round(cap_frac * n * nb)), 1)
            k = min(cap, scores.shape[0])
            top, _ = jax.lax.top_k(scores, k)
            out.append(1.0 - jnp.sum(top) / total)  # dropped active fraction
        return jnp.stack(out), active_frac

    drops, actives = [], []
    for s in range(n_scenes):
        alpha = procedural_alpha(s, h, w)
        d, af = scene_stats(jnp.asarray(alpha))
        drops.append(np.asarray(d))
        actives.append(float(af))
    drops = np.stack(drops)  # (scenes, caps)

    print(f"{n_scenes} procedural scenes @ {h}x{w}, block 64, "
          f"{nb} blocks/instance; active-block fraction "
          f"mean {np.mean(actives):.3f} max {np.max(actives):.3f} "
          f"(capacity is exceeded only above the cap fraction)")
    print(f"{'cap':>5} {'mean drop%':>10} {'p95 drop%':>10} "
          f"{'scenes w/ drop':>14}")
    for i, c in enumerate(caps):
        col = drops[:, i] * 100
        print(f"{c:5.1f} {col.mean():10.3f} {np.percentile(col, 95):10.3f} "
              f"{(col > 0).sum():>8}/{n_scenes}")


if __name__ == "__main__":
    main()
