import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.models import modules as nn
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.runtime.quantize import quantize_params_int8


def test_linear_int8_close_to_fp():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 128)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    from umgen_tpu.runtime.quantize import _quantize_linear
    pq = _quantize_linear({"w": w})
    assert pq["wq"].dtype == jnp.int8
    y_fp = nn.linear({"w": jnp.asarray(w)}, x)
    y_q = nn.linear(pq, x)
    err = np.abs(np.asarray(y_fp) - np.asarray(y_q))
    rel = err.max() / (np.abs(np.asarray(y_fp)).max() + 1e-9)
    assert rel < 0.02


def test_quantized_oar_forward_close():
    cfg = ModelConfig(dtype="float32", use_pallas_attention=False
                      ).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_params_int8(params)
    # LN weights untouched, attention/mlp weights quantized
    assert "w" in qparams["oar"]["ln1"]
    assert "wq" in qparams["oar"]["attn"]["qkv"]
    assert qparams["oar"]["attn"]["qkv"]["wq"].shape \
        == params["oar"]["attn"]["qkv"]["w"].shape
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.n_embd))
    y_fp = np.asarray(model.oar_forward(params, x))
    y_q = np.asarray(model.oar_forward(qparams, x))
    denom = np.abs(y_fp).max()
    assert np.abs(y_fp - y_q).max() / denom < 0.05
