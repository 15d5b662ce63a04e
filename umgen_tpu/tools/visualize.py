"""BEV scene visualization and video output.

Compact rebuild of the reference visualizer (ref:projects/tools/visulize.py):
a 512×512 BEV canvas per frame with the VQ-decoded map raster underlay,
rotated agent rectangles with heading/speed arrows, the ego box, and a
frame/pose text overlay; frames optionally stacked with the decoded
front-camera panel and written to mp4 with cv2.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except Exception:          # pragma: no cover
    HAS_CV2 = False

CANVAS = 512
METERS = 128.0             # BEV extent: ±64 m
SCALE = CANVAS / METERS

CATEGORY_COLORS = {
    0: (80, 170, 255),     # vehicle
    1: (90, 230, 120),     # bicycle
    2: (250, 200, 60),     # pedestrian
}
EGO_COLOR = (60, 60, 240)
COLLISION_COLOR = (0, 0, 255)


def _to_px(xy: np.ndarray) -> np.ndarray:
    """metric BEV (x forward/up, y left) → pixel coords (reference
    convention: ego centered, x up, ref:visulize.py draw_box)."""
    px = CANVAS / 2 - xy[..., 1] * SCALE
    py = CANVAS / 2 - xy[..., 0] * SCALE
    return np.stack([px, py], axis=-1)


def _box_corners(box: np.ndarray) -> np.ndarray:
    """(10,) metric box → (4, 2) BEV corners."""
    x, y, l, w, yaw = box[0], box[1], box[3], box[4], box[6]
    base = np.array([[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return (base * [l, w]) @ rot.T + [x, y]


def render_frame(boxes: Optional[np.ndarray] = None,
                 cat_ids: Optional[np.ndarray] = None,
                 valid: Optional[np.ndarray] = None,
                 map_rgb: Optional[np.ndarray] = None,
                 collision_ids: Optional[Sequence[int]] = None,
                 draw_ego: bool = True,
                 arrows: bool = True) -> np.ndarray:
    """→ (512, 512, 3) uint8 BGR canvas."""
    if map_rgb is not None:
        img = np.clip((np.asarray(map_rgb) + 1) / 2 * 255, 0,
                      255).astype(np.uint8)
        img = cv2.resize(img, (CANVAS, CANVAS),
                         interpolation=cv2.INTER_NEAREST)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, -1)
    else:
        img = np.full((CANVAS, CANVAS, 3), 30, np.uint8)

    collision_ids = set(collision_ids or [])
    if boxes is not None:
        boxes = np.asarray(boxes)
        n = boxes.shape[0]
        for i in range(n):
            if valid is not None and not valid[i]:
                continue
            pts = _to_px(_box_corners(boxes[i])).astype(np.int32)
            color = COLLISION_COLOR if i in collision_ids else \
                CATEGORY_COLORS.get(int(cat_ids[i]) if cat_ids is not None
                                    else 0, (200, 200, 200))
            cv2.polylines(img, [pts], True, color, 2)
            if arrows:
                vx, vy = boxes[i, 7], boxes[i, 8]
                speed = float(np.hypot(vx, vy))
                if speed > 0.2:
                    start = _to_px(boxes[i, :2][None])[0]
                    end = _to_px((boxes[i, :2] +
                                  np.array([vx, vy]))[None])[0]
                    cv2.arrowedLine(img, tuple(start.astype(int)),
                                    tuple(end.astype(int)), color, 1,
                                    tipLength=0.3)

    if draw_ego:
        ego = np.array([0, 0, 0, 5.176, 2.297, 1.777, 0, 0, 0, 0])
        pts = _to_px(_box_corners(ego)).astype(np.int32)
        cv2.fillPoly(img, [pts], EGO_COLOR)
    return img


def put_header(img: np.ndarray, frame_idx: int, cond_frames: int,
               pose: Optional[np.ndarray] = None) -> np.ndarray:
    """Frame number + pose overlay; green while conditioning, red when
    generated (ref:decode_map.py:41-77)."""
    color = (0, 255, 0) if frame_idx < cond_frames else (0, 0, 255)
    text = f"F: {frame_idx}"
    if pose is not None:
        p = np.trunc(np.asarray(pose) * 100) / 100
        text += f"   [dx, dy, dh]: {p}"
    return cv2.putText(img.copy(), text, (10, 20),
                       cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)


def stack_panels(*panels: Optional[np.ndarray]) -> np.ndarray:
    """Vertically stack equal-width panels (ref:visulize.py:1202-1259)."""
    ps = [p for p in panels if p is not None]
    width = max(p.shape[1] for p in ps)
    resized = []
    for p in ps:
        if p.shape[1] != width:
            h = int(round(p.shape[0] * width / p.shape[1]))
            p = cv2.resize(p, (width, h))
        resized.append(p)
    return np.concatenate(resized, axis=0)


def write_video(frames: Sequence[np.ndarray], path: str,
                fps: int = 10) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    h, w = frames[0].shape[:2]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                          (w, h))
    for f in frames:
        out.write(f)
    out.release()
    return path


def render_scene_video(path: str,
                       boxes: np.ndarray, cat_ids: np.ndarray,
                       valid: np.ndarray,
                       pose: Optional[np.ndarray] = None,
                       maps_rgb: Optional[np.ndarray] = None,
                       images: Optional[np.ndarray] = None,
                       cond_frames: int = 20, fps: int = 10) -> str:
    """Full scene → mp4.  boxes (T, 60, 10) metric, valid (T, 60),
    maps_rgb (T, h, w, 3) in [-1, 1], images (T, h, w, 3) in [-1, 1]."""
    frames = []
    T = boxes.shape[0]
    for t in range(T):
        bev = render_frame(boxes[t], cat_ids[t], valid[t],
                           maps_rgb[t] if maps_rgb is not None else None)
        bev = put_header(bev, t, cond_frames,
                         pose[t] if pose is not None else None)
        cam = None
        if images is not None:
            cam = np.clip((images[t] + 1) / 2 * 255, 0, 255).astype(np.uint8)
        frames.append(stack_panels(cam, bev))
    return write_video(frames, path, fps)
