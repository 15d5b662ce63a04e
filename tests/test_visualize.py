"""Visualizer output tests (host-side cv2 path)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from umgen_tpu.tools import visualize as vz  # noqa: E402


def _boxes(T=3, N=4):
    rng = np.random.default_rng(0)
    boxes = np.zeros((T, N, 10), np.float32)
    boxes[..., 0] = rng.uniform(-30, 30, (T, N))
    boxes[..., 1] = rng.uniform(-30, 30, (T, N))
    boxes[..., 3] = 4.5
    boxes[..., 4] = 2.0
    boxes[..., 5] = 1.6
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (T, N))
    boxes[..., 7] = rng.uniform(-3, 3, (T, N))
    cats = rng.integers(0, 3, (T, N))
    valid = np.ones((T, N), bool)
    return boxes, cats, valid


def test_render_frame_and_collision_color():
    boxes, cats, valid = _boxes()
    img = vz.render_frame(boxes[0], cats[0], valid[0], collision_ids=[1])
    assert img.shape == (vz.CANVAS, vz.CANVAS, 3) and img.dtype == np.uint8
    # collision box drew in pure red (BGR (0,0,255))
    red = (img == np.array(vz.COLLISION_COLOR)).all(-1)
    assert red.any()


def test_draw_tokens_panel():
    toks = np.arange(2 * 16).reshape(2, 16) % 8192
    panels = vz.draw_tokens(toks, H=4, W=4, scale=1)
    assert len(panels) == 2
    assert panels[0].ndim == 3


def test_draw_point_map():
    # one polyline of lane-center points (type 1 → red) crossing the canvas
    pts = np.zeros((1, 1, 16, 9), np.float32)
    pts[0, 0, :, 0] = np.linspace(-50, 50, 16)
    pts[0, 0, :, 1] = 0.0
    pts[0, 0, :, -3] = 1
    imgs = vz.draw_point_map(pts)
    assert len(imgs) == 1
    red = (imgs[0] == np.array((255, 0, 0))).all(-1)
    assert red.sum() >= 8


def test_png_cache_video_roundtrip(tmp_path):
    frames = [np.full((64, 64, 3), c, np.uint8) for c in (10, 100, 200)]
    vz.save_frame_pngs(frames, str(tmp_path / "cache"))
    out = vz.create_video_from_images(str(tmp_path / "cache"),
                                      str(tmp_path / "v.mp4"))
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 3


def test_pred_gt_video_and_merge(tmp_path):
    boxes, cats, valid = _boxes()
    path = vz.render_pred_gt_video(
        str(tmp_path / "pg.mp4"), boxes, cats, valid,
        gt_boxes=boxes, gt_cats=cats, gt_valid=valid,
        pose=np.zeros((3, 3)), cond_frames=1,
        png_cache=str(tmp_path / "cache"))
    cap = cv2.VideoCapture(path)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 3 and w == 2 * vz.CANVAS      # side-by-side pred|GT

    imgs = np.zeros((2, 128, 256, 3), np.float32)   # [-1,1] decoded panel
    merged = vz.merge_video_with_images(path, imgs,
                                        str(tmp_path / "m.mp4"),
                                        start_index=1)
    cap = cv2.VideoCapture(merged)
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert h > vz.CANVAS                       # panel appended below
