"""End-to-end harness tests: video + control branches on synthetic data."""

import os
import pickle

import jax
import numpy as np
import pytest

from umgen_tpu.config import DataConfig, InferConfig, ModelConfig
from umgen_tpu.data.dataset import NuPlanTokenDataset
from umgen_tpu.data.synthetic import (
    make_control_scene,
    write_control_scenes,
    write_synthetic_dataset,
)
from umgen_tpu.models.generate import Generator
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.tools.harness import SceneRunner


def build_runner(tmp_path, **infer_kw):
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method="greedy", use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=False
                      ).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    gen = Generator(model, params, seed=0)
    icfg = InferConfig(**infer_kw)
    return model, SceneRunner(gen, icfg, output_path=str(tmp_path),
                              save_video=False)


def test_video_branch(tmp_path):
    root = write_synthetic_dataset(str(tmp_path / "data"), n_scenes=1,
                                   seq_len=60, seed=3)
    ds = NuPlanTokenDataset(DataConfig(data_root=(root,), block_size=4))
    model, runner = build_runner(tmp_path, num_new_frames=1, cond_frames=4,
                                 input_cond_frames=3)
    out = runner.run_scene(ds[0])
    assert out["pose"].shape == (1, 4, 3)
    pkls = os.listdir(runner.token_save_path)
    assert len(pkls) == 1
    with open(os.path.join(runner.token_save_path, pkls[0]), "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_array_equal(saved["map"], out["map"])
    # resume: second run skips
    assert runner.run_scene(ds[0]) is None
    # collision metric accumulated
    r, _ = runner.box_overlap.average()
    assert r >= 0.0


def test_control_branch(tmp_path):
    cfg = ModelConfig().scaled("tiny")
    model0 = UMGen(cfg)
    scene = make_control_scene(model0.layout, cond_frames=3, new_frames=2,
                               seed=5)
    model, runner = build_runner(tmp_path, infer_task="control",
                                 num_new_frames=2, cond_frames=4,
                                 input_cond_frames=3)
    out = runner.run_scene(scene, control_test=True)
    # forced trajectory echoed into the generated pose frames
    np.testing.assert_array_equal(
        out["pose"][0, 3:], scene["control_dict"]["pose"][:2])
    assert out["bbox3d"].shape == (1, 5, 660)


def test_control_pkl_via_dataset(tmp_path):
    cfg = ModelConfig().scaled("tiny")
    model0 = UMGen(cfg)
    root = write_control_scenes(str(tmp_path / "ctrl"), model0.layout,
                                n_scenes=1, seed=6)
    ds = NuPlanTokenDataset(DataConfig(data_root=(root,),
                                       control_test=True))
    batch = ds[0]
    assert "dataset_token" in batch and "control_dict" in batch


def test_cli_config_from_args_int4_guard():
    """--kv_dtype int4 applies to the TAR rings only; the OAR cache falls
    back to int8 unless --oar_kv_dtype overrides."""
    from umgen_tpu.tools.evaluate import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--kv_dtype", "int4", "--model_scale", "debug"])
    cfg = config_from_args(args)
    assert cfg.tar_cache_dtype == "int4"
    assert cfg.oar_cache_dtype == "int8"

    args = build_parser().parse_args(
        ["--kv_dtype", "int4", "--oar_kv_dtype", "bfloat16",
         "--model_scale", "debug"])
    assert config_from_args(args).oar_cache_dtype == "bfloat16"

    args = build_parser().parse_args(
        ["--kv_dtype", "float8_e4m3fn", "--model_scale", "debug"])
    cfg = config_from_args(args)
    assert cfg.oar_cache_dtype in ("float8_e4m3fn", "int8")

    args = build_parser().parse_args(
        ["--chunked_prefill", "--model_scale", "debug"])
    assert config_from_args(args).chunked_prefill is True


@pytest.mark.slow
def test_batched_run_scenes(tmp_path):
    """run_scenes stacks video scenes into one batched rollout and still
    produces per-scene token pkls, resume skips, and metrics."""
    root = write_synthetic_dataset(str(tmp_path / "data"), n_scenes=3,
                                   seq_len=60, seed=7)
    ds = NuPlanTokenDataset(DataConfig(data_root=(root,), block_size=4))
    model, runner = build_runner(tmp_path, num_new_frames=1, cond_frames=4,
                                 input_cond_frames=3)
    outs = runner.run_scenes([ds[0], ds[1], ds[2]], pad_to=2)
    assert len(outs) == 3
    for o in outs:
        assert o["pose"].shape == (1, 4, 3)
    assert len(os.listdir(runner.token_save_path)) == 3
    # one batched timing entry covering all three scenes
    assert runner.timings[-1]["scene"] == "batch[3]"
    # resume: a second call skips everything
    assert runner.run_scenes([ds[0], ds[1], ds[2]]) == []
