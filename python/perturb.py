#!/usr/bin/env python3
"""Produce a perturbed copy of a dataset tree for renderer-independent
quality validation.

The synthetic datasets are rendered by the repo's own io/synthetic.py, so
recall/precision measured on them is partially self-referential. This tool
re-encodes every scene through a camera-degradation stack — gaussian blur,
vignetting, chromatic noise + white-balance error, JPEG round-trip — so the
pixels the pipeline sees did NOT come from the renderer unmodified, while
the geometry and ground truth stay exact. The standard harness
(record.py + detection_benchmark.py / blob_benchmark.py) runs on the output
tree untouched.

Usage:
    python python/perturb.py --data test-data --out test-data-perturbed \
        [--profile light|heavy]
"""
from __future__ import annotations

import argparse
import shutil
import zlib
from pathlib import Path

import cv2
import numpy as np

PROFILES = {
    # sigma_px, vignette corner gain, chroma noise sigma, wb gains, jpeg q
    "light": dict(blur=0.8, vignette=0.85, noise=2.5,
                  wb=(1.05, 1.0, 0.95), jpeg=80),
    # moderate sits between light and medium: the strongest degradation at
    # which the ~3 px ball's disc-mean color keeps a positive margin over
    # the field/line colors (python/ball_detectability.py), so ball recall
    # can be gated meaningfully (>=0.5) instead of loss-only
    "moderate": dict(blur=0.85, vignette=0.82, noise=2.8,
                     wb=(1.06, 1.0, 0.94), jpeg=75),
    "medium": dict(blur=1.1, vignette=0.75, noise=4.0,
                   wb=(1.08, 1.0, 0.92), jpeg=65),
    # heavy exceeds the documented ~10 mm/px resolution limit for the
    # synthetic cameras (blur sigma ~ half the blob radius) — used for
    # degradation curves, not pass/fail gates
    "heavy": dict(blur=1.6, vignette=0.65, noise=6.0,
                  wb=(1.12, 1.0, 0.88), jpeg=55),
}


def _vignette_mask(h: int, w: int, corner_gain: float) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    r /= r.max()
    return (1.0 - (1.0 - corner_gain) * r * r)[..., None]


def perturb_frame(bgr: np.ndarray, p: dict, rng: np.random.Generator,
                  mask: np.ndarray) -> np.ndarray:
    img = bgr.astype(np.float32)
    if p["blur"] > 0:
        img = cv2.GaussianBlur(img, (0, 0), p["blur"])
    img *= mask
    img *= np.asarray(p["wb"], dtype=np.float32)  # B, G, R gains
    img += rng.normal(0.0, p["noise"], img.shape).astype(np.float32)
    img = np.clip(img, 0, 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, p["jpeg"]])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def perturb_video(src: Path, dst: Path, p: dict, seed: int) -> int:
    cap = cv2.VideoCapture(str(src))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out = cv2.VideoWriter(
        str(dst), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    rng = np.random.default_rng(seed)
    mask = _vignette_mask(h, w, p["vignette"])
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        out.write(perturb_frame(frame, p, rng, mask))
        n += 1
    cap.release()
    out.release()
    return n


def perturb_dataset(data: Path, out: Path, profile: str) -> None:
    p = PROFILES[profile]
    for field_dir in sorted(d for d in data.iterdir() if d.is_dir()):
        for cam_dir in sorted(field_dir.glob("cam*")):
            rel = cam_dir.relative_to(data)
            dst_cam = out / rel
            dst_cam.mkdir(parents=True, exist_ok=True)
            for item in cam_dir.iterdir():
                dst = dst_cam / item.name
                if item.is_dir():
                    shutil.copytree(item, dst, dirs_exist_ok=True)
                elif item.suffix == ".mp4":
                    n = perturb_video(item, dst, p, seed=zlib.crc32(item.name.encode()) & 0xFFFF)
                    print(f"{rel}/{item.name}: {n} frames perturbed ({profile})")
                elif item.suffix == ".png" and item.stem != "field":
                    img = cv2.imread(str(item))
                    rng = np.random.default_rng(zlib.crc32(item.name.encode()) & 0xFFFF)
                    mask = _vignette_mask(*img.shape[:2], p["vignette"])
                    cv2.imwrite(str(dst), perturb_frame(img, p, rng, mask))
                else:
                    shutil.copy2(item, dst)


def main():
    ap = argparse.ArgumentParser(prog="dataset perturbation")
    ap.add_argument("--data", type=Path, default=Path("test-data"))
    ap.add_argument("--out", type=Path, required=True)
    ap.add_argument("--profile", choices=sorted(PROFILES), default="light")
    args = ap.parse_args()
    perturb_dataset(args.data, args.out, args.profile)


if __name__ == "__main__":
    main()
