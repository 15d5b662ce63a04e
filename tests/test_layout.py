import numpy as np
import pytest

from umgen_tpu.config import BOS_EOS, ModelConfig
from umgen_tpu.layout import SequenceLayout, token_len


def test_full_task_layout():
    lo = SequenceLayout("pose_map_bbox3d_image")
    # headline constant (ref:infer_fun.py:118)
    assert lo.seq_len == 2207
    assert lo.input_len == 2208
    pose, mp, box, img = lo.segments
    assert (pose.start, pose.end) == (1, 5)
    assert (mp.start, mp.end) == (6, 1031)
    assert (box.start, box.end) == (1032, 1693)
    assert (img.start, img.end) == (1694, 2207)


def test_sep_positions_match_reference_d_token_pos():
    """Recompute d_token_pos exactly as ref:UMGen.py:976-984 and compare."""
    lo = SequenceLayout("pose_map_bbox3d_image")
    token_lens = {m: token_len(m) for m in lo.mod_order}
    d_pos = {}
    curr = 0
    for mod in lo.mod_order:
        curr += 1
        d_pos[curr] = BOS_EOS[mod][0]
        curr = curr + token_lens[mod] - 1
        d_pos[curr] = BOS_EOS[mod][1]
    assert d_pos == lo.sep_pos
    for p, tok in d_pos.items():
        assert lo.is_sep[p]
        assert lo.sep_token[p] == tok
    assert lo.is_sep.sum() == 8


def test_pos_mod_matches_reference_scan():
    """pos_mod reimplemented the reference way (ref:UMGen.py:986-992)."""
    lo = SequenceLayout("pose_map_bbox3d_image")
    token_lens = {m: token_len(m) for m in lo.mod_order}

    def ref_pos_mod(pos):
        curr = 0
        for mod in lo.mod_order:
            curr += 1
            if curr <= pos <= curr + token_lens[mod] - 1:
                return mod
            curr = curr + token_lens[mod] - 1

    for pos in range(1, lo.seq_len + 1):
        assert lo.pos_mod(pos) == ref_pos_mod(pos), pos


def test_bbox_object_attr_indexing():
    lo = SequenceLayout("pose_map_bbox3d_image")
    # first bbox content position → object 0, attr 0
    assert lo.bbox_object_and_attr(1033) == (0, 0)
    # true mapping: box k owns positions 1033+11k .. 1043+11k
    for pos in range(1033, 1693):
        obj, attr = lo.bbox_object_and_attr(pos)
        assert obj == (pos - 1033) // 11
        assert attr == (pos - 1033) % 11
    # category token of box 0 completes at attr == 10
    assert lo.bbox_object_and_attr(1043) == (0, 10)
    # reference control-path formula quirk (ref:UMGen.py:1084)
    for pos in range(1033, 1693):
        assert lo.control_object_id(pos) == (pos - 1032) // 11


def test_pose_map_task():
    lo = SequenceLayout("pose_map")
    assert lo.seq_len == 5 + 1026  # 1031
    assert lo.segment("map").content_len == 1024


def test_slices_partition_stream():
    lo = SequenceLayout("pose_map_bbox3d_image")
    sl = lo.slices()
    stream = np.zeros(lo.seq_len)
    covered = 0
    for s in sl.values():
        covered += s.stop - s.start
    # content + 8 separators == full stream
    assert covered + 8 == lo.seq_len
