import numpy as np
import pytest

from umgen_tpu.data.normalize import MinMaxNormalizer, StandardNormalizer
from umgen_tpu.data.pipeline import ScenePipeline
from umgen_tpu.data.tokenizers import (
    BBox3DTokenizer,
    DigitalBinsTokenizer,
    TextTokenizer,
    default_bbox3d_tokenizer,
    default_ego_tokenizer,
)


class TestDigitalBins:
    def test_vocab(self):
        tok = default_ego_tokenizer()
        assert tok.vocab_size == 1024
        assert len(tok) == 1024

    def test_encode_matches_np_digitize(self):
        tok = default_ego_tokenizer()
        x = np.array([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5])
        expect = np.clip(np.digitize(x, np.linspace(-1, 1, 1024)), 0, 1023)
        np.testing.assert_array_equal(tok.encode(x), expect)

    def test_roundtrip_within_half_bin(self):
        tok = default_ego_tokenizer()
        rng = np.random.default_rng(0)
        x = rng.uniform(-0.99, 0.99, size=1000)
        rec = tok.decode(tok.encode(x))
        bin_w = 2.0 / 1023
        assert np.max(np.abs(rec - x)) <= bin_w

    def test_decode_midpoints(self):
        tok = DigitalBinsTokenizer([(0.0, 1.0, 11)], seq_len=1)
        # token t decodes to (bins[t-1] + bins[t]) / 2 (ref:tokenizer.py:351-354)
        bins = np.linspace(0, 1, 11)
        np.testing.assert_allclose(tok.decode(np.array([5])),
                                   (bins[4] + bins[5]) / 2)
        # token 0 clips both edges to bins[0]
        np.testing.assert_allclose(tok.decode(np.array([0])), bins[0])

    def test_decode_table_matches_decode(self):
        tok = default_ego_tokenizer()
        ids = np.arange(1024)
        np.testing.assert_allclose(tok.decode_table(), tok.decode(ids),
                                   rtol=1e-6)


class TestTextTokenizer:
    def test_roundtrip(self):
        tok = TextTokenizer(["vehicle", "bicycle", "pedestrian"], start=1024)
        ids = tok.encode(["pedestrian", "vehicle"])
        np.testing.assert_array_equal(ids, [1026, 1024])
        assert tok.decode(ids) == ["pedestrian", "vehicle"]

    def test_out_of_range_is_none(self):
        tok = TextTokenizer(["a", "b"], start=10)
        assert tok.decode(np.array([9, 12, 10])) == ["none", "none", "a"]


class TestBBox3D:
    def test_vocab_layout(self):
        tok = default_bbox3d_tokenizer()
        assert tok.vocab_size == 1027          # 1024 bins + 3 cats
        assert len(tok) == 1028
        assert tok.pad_token == 1027
        assert tok.cat_tok.start == 1024
        assert tok.seq_len == 660

    def test_slotting_persistent_identity(self):
        tok = default_bbox3d_tokenizer()
        rng = np.random.default_rng(1)
        # 3 frames; track 7 appears in frames 0, 2; track 9 only frame 1
        frames, tids = [], []
        rows = {7: None, 9: None}
        for t, present in enumerate([[7], [9], [7]]):
            toks = rng.integers(0, 1024, size=(len(present), 11))
            toks[:, 10] = 1024
            frames.append(toks)
            tids.append(np.array(present))
            for tid, row in zip(present, toks):
                rows[tid] = row
        slotted = tok.slot_frames(frames, tids)
        assert slotted.shape == (3, 60, 11)
        # track 7 is slot 0 (first appearance), track 9 slot 1
        assert not np.all(slotted[0, 0] == tok.pad_token)
        assert np.all(slotted[1, 0] == tok.pad_token)
        assert not np.all(slotted[1, 1] == tok.pad_token)
        assert not np.all(slotted[2, 0] == tok.pad_token)
        # unused slots are fully pad
        assert np.all(slotted[:, 2:] == tok.pad_token)

    def test_slot_cap_at_60(self):
        tok = default_bbox3d_tokenizer()
        frames = [np.zeros((70, 11), dtype=np.int64)]
        tids = [np.arange(70)]
        slotted = tok.slot_frames(frames, tids)
        assert slotted.shape == (1, 60, 11)

    def test_decode_slots_valid_mask(self):
        tok = default_bbox3d_tokenizer()
        tokens = np.full((1, 660), tok.pad_token, dtype=np.int64)
        box = np.concatenate([np.full(10, 512), [1025]])
        tokens[0, :11] = box
        values, cats, valid = tok.decode_slots(tokens)
        assert valid.shape == (1, 60)
        assert valid[0, 0] and not valid[0, 1:].any()
        assert cats[0, 0] == 1   # bicycle
        # bin 512 of linspace(0,1,1024) midpoint
        bins = np.linspace(0, 1, 1024)
        np.testing.assert_allclose(values[0, 0],
                                   (bins[511] + bins[512]) / 2)


class TestNormalizers:
    def test_standard_roundtrip(self):
        n = StandardNormalizer()
        x = np.array([[3.0, -1.0, 0.4]])
        np.testing.assert_allclose(n.unnormalize(n.normalize(x)), x,
                                   rtol=1e-6)
        np.testing.assert_allclose(n.normalize(x), x / np.array([10, 4, 1]))

    def test_minmax_roundtrip(self):
        n = MinMaxNormalizer()
        rng = np.random.default_rng(0)
        x = rng.uniform(-3, 3, size=(5, 10)).astype(np.float32)
        np.testing.assert_allclose(n.unnormalize(n.normalize(x)), x,
                                   rtol=1e-4, atol=1e-4)

    def test_minmax_range(self):
        n = MinMaxNormalizer()
        # x position -64..64 maps to 0..1
        x = np.zeros((1, 10), dtype=np.float32)
        x[0, 0] = -64
        assert n.normalize(x)[0, 0] == 0.0
        x[0, 0] = 64
        assert n.normalize(x)[0, 0] == 1.0


class TestPipeline:
    def test_encode_decode_roundtrip(self):
        pipe = ScenePipeline()
        rng = np.random.default_rng(2)
        T = 4
        pose = rng.uniform(-2, 6, size=(T, 3)).astype(np.float32)
        pose[:, 2] *= 0.1
        map_toks = rng.integers(0, 8192, size=(T, 1024))
        boxes = [rng.uniform(-40, 40, size=(3, 10)).astype(np.float32)
                 for _ in range(T)]
        for b in boxes:
            b[:, 3:6] = np.abs(b[:, 3:6]) * 0.05 + 1.0
            b[:, 6] = np.clip(b[:, 6] * 0.05, -3, 3)
            b[:, 7:9] = np.clip(b[:, 7:9] * 0.1, -10, 10)
            b[:, 9] = np.clip(b[:, 9] * 0.005, -0.25, 0.25)
            b[:, 2] = np.clip(b[:, 2] * 0.05, -4, 4)
        cats = [["vehicle", "bicycle", "pedestrian"]] * T
        tids = [np.array([1, 2, 3])] * T
        img_toks = rng.integers(0, 8192, size=(T, 512))

        data = pipe.encode(pose, map_toks, boxes, cats, tids, img_toks)
        assert data["pose"].shape == (T, 3)
        assert data["map"].shape == (T, 1024)
        assert data["bbox3d"].shape == (T, 660)
        assert data["image"].shape == (T, 512)

        rec_pose = pipe.decode_pose(data["pose"])
        np.testing.assert_allclose(rec_pose, pose, atol=0.02)

        metric, cat_ids, valid = pipe.decode_bboxes(data["bbox3d"])
        assert valid[:, :3].all() and not valid[:, 3:].any()
        for t in range(T):
            np.testing.assert_allclose(metric[t, :3], boxes[t], atol=0.15)


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"),
    reason="upstream reference not mounted",
)
class TestReferenceParity:
    """Cross-check against the upstream PyTorch tokenizers when available."""

    def _ref_modules(self):
        import sys
        sys.path.insert(0, "/root/reference")
        from projects.plugin.data.transforms import tokenizer as ref_tok
        return ref_tok

    def test_bins_parity(self):
        ref_tok = self._ref_modules()
        ref = ref_tok.DigitalBinsTokenizer(
            bins=[(-1.0, 1.0, 1024)], data_key="pose", seq_len=3,
            special_tokens=None, start=0)
        ours = default_ego_tokenizer()
        rng = np.random.default_rng(3)
        x = rng.uniform(-1.3, 1.3, size=(8, 3))
        np.testing.assert_array_equal(
            ours.encode(x), ref.encode(x.copy()))
        toks = rng.integers(0, 1024, size=(8, 3))
        np.testing.assert_allclose(
            ours.decode(toks), ref.decode(toks.copy(), keep_order=True))

    def test_bbox_slotting_parity(self):
        ref_tok = self._ref_modules()
        ref = ref_tok.BBox3DTokenizer(
            bins=[(0.0, 1.0, 1024)],
            category_file="/root/reference/projects/configs/category.txt",
            start=0, special_tokens=[], pad_to_length=60,
            target_key=["bbox3d"], shift_object_order_pro=0)
        ours = default_bbox3d_tokenizer()
        rng = np.random.default_rng(4)
        T = 5
        boxes = [rng.uniform(0, 1, size=(4, 10)) for _ in range(T)]
        cats = [["vehicle", "bicycle", "pedestrian", "vehicle"]] * T
        tids = [np.array([11, 22, 33, 44]) for _ in range(T)]

        data = {"bbox3d": [b.copy() for b in boxes],
                "bbox3d_cat": [list(c) for c in cats],
                "bbox3d_track_id": [t.copy() for t in tids]}
        ref_out = ref(data)["bbox3d"]          # (T, 660)
        ours_out = ours.encode_clip(boxes, cats, tids)
        np.testing.assert_array_equal(ours_out, ref_out)
