import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models.umgen import UMGen, build_buffers


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      use_pallas_attention=False).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def _inputs(model, T=3, B=1, seed=0):
    raw = make_token_batch(model.layout, T=T, B=B, seed=seed,
                           config=model.config)
    return {k: jnp.asarray(v) for k, v in raw.items()}


def test_param_structure(tiny):
    cfg, model, params = tiny
    assert params["spe"].shape == (2207, cfg.n_embd)
    assert params["be"].shape == (1028, cfg.n_embd)
    assert params["head_ar_map"]["w"].shape == (cfg.n_embd, 8192)
    # attention has bias, mlp does not (reference quirk)
    layer0 = jax.tree.map(lambda a: a[0], params["oar"])
    assert "b" in layer0["attn"]["qkv"]
    assert "b" not in layer0["mlp"]["fc"]
    n = model.param_count(params)
    assert n > 0


def test_larger_scale_param_count():
    """The reference reports ~2.4B params for UMGen_Large
    (ref:UMGen.py:264-265 prints '%.2fB'); our derived count must land in
    the same bracket."""
    cfg = ModelConfig()  # larger defaults
    model = UMGen(cfg)
    # count analytically without allocating 2.4B floats
    d = cfg.n_embd

    def block_tar_params():
        attn = (d * 3 * d + 3 * d) + (d * d + d)
        mlpp = d * 4 * d + 4 * d * d
        ln = d
        return 3 * (attn + mlpp + 2 * ln)

    def block_oar_params():
        attn = (d * 3 * d + 3 * d) + (d * d + d)
        mlpp = d * 4 * d + 4 * d * d
        return attn + mlpp + 2 * d

    def decoder_params():
        self_attn = (d * 3 * d + 3 * d) + (d * d + d)
        cross = 4 * (d * d + d)
        mlpp = d * 4 * d + 4 * d * d
        return self_attn + cross + mlpp + 4 * d

    total = (36 * block_tar_params() + 36 * block_oar_params()
             + 24 * block_tar_params() + 24 * block_tar_params()
             + 12 * block_tar_params() + 12 * decoder_params())
    assert 2.0e9 < total < 2.8e9


def test_ego_logits_shapes(tiny):
    cfg, model, params = tiny
    inputs = _inputs(model)
    logits = model.ego_logits(params, inputs)
    assert logits.shape == (1, 3, cfg.pose_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_tar_priors_shapes_and_jit(tiny):
    cfg, model, params = tiny
    inputs = _inputs(model)
    fn = jax.jit(model.tar_priors)
    out = fn(params, inputs)
    assert out["prior_seq"].shape == (1, 2207, cfg.n_embd)
    assert out["pose_diff"].shape == (1, 3, 3)
    assert np.isfinite(np.asarray(out["prior_seq"])).all()


def test_pose_decode_in_graph_matches_pipeline(tiny):
    cfg, model, params = tiny
    from umgen_tpu.data.pipeline import ScenePipeline
    pipe = ScenePipeline()
    toks = np.array([[[3, 512, 1023]]], dtype=np.int32)
    got = np.asarray(model.decode_pose(params, jnp.asarray(toks)))
    exp = pipe.decode_pose(toks)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_oar_forward_causal(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 10, cfg.n_embd))
    y1 = model.oar_forward(params, x)
    x2 = x.at[:, 7:].set(0.0)
    y2 = model.oar_forward(params, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :7]), np.asarray(y2[:, :7]),
                               atol=1e-5)


def test_bbox_spatial_pe_broadcast(tiny):
    """Spatial PE must depend only on the first two attr tokens per object
    and broadcast over all 11 positions (ref:UMGen.py:411-435)."""
    cfg, model, params = tiny
    toks = np.full((1, 1, 660), 100, dtype=np.int32)
    a = model.embed_bbox(params, jnp.asarray(toks), spatial_pe=True)
    toks2 = toks.copy()
    toks2[0, 0, 5] = 200   # attr 5 of object 0 — not x/y
    b = model.embed_bbox(params, jnp.asarray(toks2), spatial_pe=True)
    # only position 5 changes
    diff = np.abs(np.asarray(a - b)).sum(axis=-1)[0, 0]
    assert diff[5] > 0
    assert np.all(diff[np.arange(660) != 5] == 0)
    # changing x token (attr 0) changes all 11 tokens of that object
    toks3 = toks.copy()
    toks3[0, 0, 0] = 300
    c = model.embed_bbox(params, jnp.asarray(toks3), spatial_pe=True)
    diff = np.abs(np.asarray(a - c)).sum(axis=-1)[0, 0]
    assert np.all(diff[:11] > 0)
    assert np.all(diff[11:] == 0)
