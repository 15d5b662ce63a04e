import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.runtime.checkpoint import load_params, save_params


def test_params_roundtrip(tmp_path):
    cfg = ModelConfig(dtype="float32", use_pallas_attention=False
                      ).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    restored = load_params(path, like=params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_torch_import_mapping():
    """Synthetic torch-style state dict → pytree: shapes + transposition."""
    torch = pytest.importorskip("torch")
    from umgen_tpu.runtime.torch_import import import_umgen

    cfg = ModelConfig().scaled("debug")
    d = cfg.n_embd
    sd = {}

    def lin(name, i, o, bias):
        sd[f"{name}.weight"] = torch.randn(o, i)
        if bias:
            sd[f"{name}.bias"] = torch.randn(o)

    def ln(name):
        sd[f"{name}.weight"] = torch.ones(d)

    def attn(name):
        lin(f"{name}.c_attn", d, 3 * d, True)
        lin(f"{name}.c_proj", d, d, True)

    def mlp(name):
        lin(f"{name}.c_fc", d, 4 * d, False)
        lin(f"{name}.c_proj", 4 * d, d, False)

    def block_tar(name):
        for i in (1, 2, 3, 4, 5, 6):
            ln(f"{name}.ln_{i}")
        attn(f"{name}.spatial_attn_1")
        attn(f"{name}.temporal_attn")
        attn(f"{name}.spatial_attn_2")
        mlp(f"{name}.mlp1"); mlp(f"{name}.mlp2"); mlp(f"{name}.mlp3")

    def block_oar(name):
        ln(f"{name}.ln_1"); ln(f"{name}.ln_2")
        attn(f"{name}.temporal_attn"); mlp(f"{name}.mlp")

    def dec(name):
        for i in (1, 2, 3, 4):
            ln(f"{name}.ln_{i}")
        attn(f"{name}.self_attn")
        for p in ("q_attn", "k_attn", "v_attn", "c_proj"):
            lin(f"{name}.cross_attn.{p}", d, d, True)
        mlp(f"{name}.mlp1")

    tr = "transformer"
    for n, e in [("egoe", 3), ("axe", 8), ("be", 1028), ("tpe", 100),
                 ("spe", 2207), ("tske", 7)]:
        sd[f"{tr}.{n}.weight"] = torch.randn(e, d)
    # codebook-dim (16) → d GMLPs (ref:UMGen.py:215,235)
    lin("map_mlp_pre.c_fc", 16, 4 * d, False)
    lin("map_mlp_pre.c_proj", 4 * d, d, False)
    lin("img_mlp_pre.c_fc", 16, 4 * d, False)
    lin("img_mlp_pre.c_proj", 4 * d, d, False)
    for n in ("ln_tar", "ln_oar", "ln_ego_tar", "ln_ego", "ln_map_tar",
              "ln_box_tar"):
        ln(f"{tr}.{n}")
    block_tar(f"{tr}.TAR.0"); block_oar(f"{tr}.OAR.0")
    block_tar(f"{tr}.ego_tar.0"); dec(f"{tr}.ego_cross_attn.0")
    block_tar(f"{tr}.map_tar.0"); block_tar(f"{tr}.box_tar.0")
    for h, o in [("head_tar_aux", 8), ("head_tar_pose", 1024),
                 ("head_tar_map", 8192), ("head_tar_bbox3d", 1028),
                 ("head_ar_aux", 8), ("head_ar_pose", 1024),
                 ("head_ar_map", 8192), ("head_ar_bbox3d", 1028),
                 ("head_ego", 1024), ("head_tar_img", 8192),
                 ("head_ar_img", 8192)]:
        lin(f"{tr}.{h}", d, o, False)

    params = import_umgen(sd, cfg)

    # torch linear [out, in] transposes to [in, out]
    np.testing.assert_allclose(
        params["head_ar_map"]["w"],
        sd[f"{tr}.head_ar_map.weight"].numpy().T)
    # stacked layer leading dim
    assert params["tar"]["sa1"]["qkv"]["w"].shape == (1, d, 3 * d)
    # attention has bias, mlp doesn't (the reference quirk)
    assert "b" in params["oar"]["attn"]["qkv"]
    assert "b" not in params["oar"]["mlp"]["fc"]
    # embeddings untransposed
    np.testing.assert_allclose(params["be"],
                               sd[f"{tr}.be.weight"].numpy())

    # n_step > 1 swaps the bbox TAR head for the widened multi-step one
    # (ref:UMGen.py:221-226)
    import dataclasses
    sd2 = dict(sd)
    del sd2[f"{tr}.head_tar_bbox3d.weight"]
    sd2[f"{tr}.head_tar_n_step_bbox3d.weight"] = torch.randn(2 * 1028, d)
    p2 = import_umgen(sd2, dataclasses.replace(cfg, n_step=2))
    assert "head_tar_bbox3d" not in p2
    assert p2["head_tar_n_step_bbox3d"]["w"].shape == (d, 2 * 1028)

    # imported params must drive the model forward
    model = UMGen(ModelConfig(dtype="float32", use_pallas_attention=False
                              ).scaled("debug"))
    from umgen_tpu.models.umgen import build_buffers
    full = jax.tree.map(jnp.asarray, params)
    full["buffers"] = build_buffers(model.config)
    from umgen_tpu.data.synthetic import make_token_batch
    raw = make_token_batch(model.layout, T=2, B=1, config=model.config)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    logits = model.ego_logits(full, inputs)
    assert np.isfinite(np.asarray(logits)).all()
