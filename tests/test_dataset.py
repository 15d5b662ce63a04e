import numpy as np
import pytest

from umgen_tpu.config import DataConfig
from umgen_tpu.data.dataset import NuPlanTokenDataset, get_frame_indices
from umgen_tpu.data.synthetic import make_scene, write_synthetic_dataset


def test_frame_indices_normal():
    # seq 220, block 50, gap 4, start 10 → 50 frames from 10 step 4
    idx = get_frame_indices(220, 50, 4, 10)
    assert idx == [10 + 4 * i for i in range(50)]


def test_frame_indices_short_clip():
    # clip shorter than block*gap → shrink block (ref:...py:157-167)
    idx = get_frame_indices(60, 50, 4, 10)
    block = (60 - 4 - 1) // 4
    assert len(idx) == block
    assert idx[0] == min(10, 4)


def test_dataset_end_to_end(tmp_path):
    root = write_synthetic_dataset(str(tmp_path), n_scenes=2, seq_len=120,
                                   seed=7)
    cfg = DataConfig(data_root=(root,), block_size=22, sampling_gap=4,
                     start_index=10)
    ds = NuPlanTokenDataset(cfg)
    assert len(ds) == 2
    data = ds[0]
    T = 22
    assert data["pose"].shape == (T, 3)
    assert data["map"].shape == (T, 1024)
    assert data["bbox3d"].shape == (T, 660)
    assert data["image"].shape == (T, 512)
    assert data["map"].max() < 8192 and data["map"].min() >= 0
    # bbox tokens within [0, 1027]
    assert data["bbox3d"].min() >= 0 and data["bbox3d"].max() <= 1027
    # pose tokens in bin vocab
    assert data["pose"].min() >= 0 and data["pose"].max() < 1024


def test_pose_diff_geometry():
    """Pose diff must be the next frame's origin in the current lidar frame."""
    scene = make_scene(seq_len=60, n_objects=4, seed=3)
    cfg = DataConfig(data_root=(), block_size=8, sampling_gap=4,
                     start_index=10)
    ds = NuPlanTokenDataset.__new__(NuPlanTokenDataset)
    ds.config = cfg
    from umgen_tpu.data.pipeline import ScenePipeline
    ds.pipeline = ScenePipeline()
    from umgen_tpu.config import CATEGORIES
    ds.categories = set(CATEGORIES)
    data = ds.format_scene(scene, 0, "x.pkl")
    pose = ds.pipeline.decode_pose(data["pose"])
    # synthetic ego moves forward ~speed*0.1*gap each sampled step
    assert np.all(pose[:, 0] > 0)          # dx forward
    assert np.all(np.abs(pose[:, 2]) < 0.5)  # small heading change


# ---------------------------------------------------------------------------
# image-loading transforms (data/loading.py; parity with ref loading.py)
# ---------------------------------------------------------------------------
def test_loading_transforms(tmp_path):
    cv2 = pytest.importorskip("cv2")
    import numpy as np
    from umgen_tpu.data.loading import (LoadMultiViewImageFromFiles,
                                        ResizeCropFlipRotImage,
                                        ToTensorCollect)
    paths = []
    for i in range(2):
        img = np.full((512, 1024, 3), 40 * (i + 1), np.uint8)
        p = str(tmp_path / f"cam{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    res = {"img_filename": paths,
           "intrinsics": [np.eye(4, dtype=np.float32) * 500.0
                          for _ in range(2)]}
    res = LoadMultiViewImageFromFiles(to_float32=True)(res)
    assert len(res["img"]) == 2 and res["scale_factor"] == 1.0
    res = ResizeCropFlipRotImage({"final_dim": (256, 512),
                                  "resize_lim": (1.0, 1.0),
                                  "bot_pct_lim": (0.0, 0.0),
                                  "rand_flip": False,
                                  "rot_lim": (0.0, 0.0)})(res)
    assert res["img"][0].shape[:2] == (256, 512)
    # the ida transform scaled the intrinsics by the resize factor (0.5)
    assert abs(res["intrinsics"][0][0, 0] - 250.0) < 1e-3
    res = ToTensorCollect(["img"])(res)
    assert res["img"].shape == (2, 3, 256, 512)


def test_error_scene_journaled_not_fatal(tmp_path):
    """A corrupt pkl must be skipped + journaled, not kill the run
    (ref:UMGen_nuplan_dataset.py:183-200)."""
    root = write_synthetic_dataset(str(tmp_path), n_scenes=1, seq_len=120,
                                   seed=0)
    bad = f"{root}/aaa_corrupt.pkl"       # sorts first
    with open(bad, "wb") as f:
        f.write(b"\x80\x04 truncated garbage")
    cfg = DataConfig(data_root=(root,), block_size=22, sampling_gap=4,
                     start_index=10)
    ds = NuPlanTokenDataset(cfg)
    assert len(ds) == 2
    assert ds[0] is None                   # corrupt scene skipped
    assert ds[1] is not None               # good scene still loads
    assert len(ds.error_scenes) == 1
    assert "aaa_corrupt" in ds.error_scenes[0]["scene"]
    journal = str(tmp_path / "journal" / "error_scene.txt")
    ds.write_error_journal(journal)
    with open(journal) as f:
        assert "aaa_corrupt" in f.read()
