"""The driver's bench contract, exercised end-to-end at tiny scale.

BENCH_r03 recorded rc=124 (driver timeout, no JSON) — the single most
expensive process failure of round 3.  This test pins the contract that
prevents a repeat: `python bench.py` serving a PRE-QUANTIZED artifact
(scripts/make_serving_ckpt.py) must print exactly one parseable JSON
line on stdout with the metric/value/unit/vs_baseline keys, and must
report the checkpoint step it served.

Runs the real subprocesses (the driver runs `python bench.py`, not an
import) on the CPU backend at tiny scale.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_serves_prequantized_artifact(tmp_path):
    import jax

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.parallel.train import UMGenTrainer
    from umgen_tpu.runtime.checkpoint import save_train_state

    # a train-state checkpoint (random weights — the contract under test
    # is serving mechanics, not quality) + its training-regime metadata
    cfg = ModelConfig().scaled("tiny")
    model = UMGen(cfg)
    trainer = UMGenTrainer(model, optimizer="sign_sgd")
    state = trainer.init_state(model.init_params(jax.random.PRNGKey(0)))
    ckpt_dir = tmp_path / "ckpt"
    save_train_state(str(ckpt_dir / "final"), state)
    (ckpt_dir / "train_meta.json").write_text(
        json.dumps({"window": 3, "model_scale": "tiny"}))

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")

    # offline pre-quantization -> serving artifact (+ meta)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "make_serving_ckpt.py"),
         "--src", str(ckpt_dir / "final"),
         "--dst", str(tmp_path / "serving"),
         "--scale", "tiny", "--fused", "0"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads((tmp_path / "serving_meta.json").read_text())
    assert meta["scale"] == "tiny" and meta["trained_window"] == 3

    # the driver's command, pointed at the artifact
    env.update(UMGEN_BENCH_SCALE="tiny", UMGEN_BENCH_BATCH="2",
               UMGEN_BENCH_FRAMES="4", UMGEN_BENCH_BUDGET_S="500",
               UMGEN_BENCH_SERVING=str(tmp_path / "serving"),
               UMGEN_BENCH_KV_DTYPE="bfloat16",
               UMGEN_BENCH_OAR_KV="int8")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout      # ONE JSON line on stdout
    out = json.loads(lines[0])
    assert out["metric"] == "frames_per_sec_per_chip"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    # it served the artifact (not random init): step is reported and the
    # temporal-PE clamp came from the artifact's trained window
    assert "trained-ckpt@0" in out["unit"]


@pytest.mark.slow
def test_bench_ladder_falls_back_and_annotates():
    """Rung 1 fails (B=0 crashes the child), the fallback rung must
    still produce the one JSON line, rc 0, with the rung annotation —
    the BENCH_r04 failure mode (rc=1, no JSON) must be impossible."""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               UMGEN_BENCH_SCALE="tiny", UMGEN_BENCH_BATCH="0",
               UMGEN_BENCH_FRAMES="4", UMGEN_BENCH_BUDGET_S="400",
               UMGEN_BENCH_KV_DTYPE="bfloat16",
               UMGEN_BENCH_OAR_KV="int8", UMGEN_BENCH_CKPT="none")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert out["value"] > 0, out          # the fallback rung measured
    assert "rung=2" in out["unit"], out["unit"]
