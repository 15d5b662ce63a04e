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


# ---------------------------------------------------------------------------
# training-time quantizers (models/quantize.py)
# ---------------------------------------------------------------------------
def test_norm_ema_quantizer_basic():
    from umgen_tpu.models.quantize import (EMAState, init_ema_state,
                                           norm_ema_quantize)
    key = jax.random.PRNGKey(0)
    st = init_ema_state(key, n_codes=16, dim=8)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 8))
    zq, loss, idx, st2 = norm_ema_quantize(st, z, train=True)
    assert zq.shape == z.shape and idx.shape == (4, 5)
    assert float(loss) >= 0
    # codebook rows stay l2-normalized after the EMA step
    norms = np.linalg.norm(np.asarray(st2.embedding), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # repeated training on the same batch shrinks the commit loss
    for _ in range(50):
        _, loss2, _, st2 = norm_ema_quantize(st2, z, train=True)
    assert float(loss2) < float(loss)


def test_norm_ema_straight_through_gradient():
    from umgen_tpu.models.quantize import init_ema_state, norm_ema_quantize
    st = init_ema_state(jax.random.PRNGKey(0), 8, 4)

    def f(z):
        zq, loss, _, _ = norm_ema_quantize(st, z, train=False)
        return jnp.sum(zq ** 2) + loss

    g = jax.grad(f)(jax.random.normal(jax.random.PRNGKey(1), (3, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_norm_ema_psum_sync_matches_single_device():
    """Sharded quantize with axis_name must equal the unsharded update."""
    from functools import partial
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from umgen_tpu.models.quantize import init_ema_state, norm_ema_quantize

    st = init_ema_state(jax.random.PRNGKey(0), 16, 8)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 8))

    _, _, idx_ref, st_ref = norm_ema_quantize(st, z, train=True)

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))

    def local(st, z):
        zq, _, idx, new_st = norm_ema_quantize(st, z, train=True,
                                               axis_name="dp")
        return zq, idx, new_st

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P("dp", None)),
                   out_specs=(P("dp", None), P("dp"), P()))
    _, idx_sh, st_sh = fn(st, z)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_sh))
    np.testing.assert_allclose(np.asarray(st_ref.embedding),
                               np.asarray(st_sh.embedding), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_ref.cluster_size),
                               np.asarray(st_sh.cluster_size), atol=1e-5)


def test_kmeans_init():
    from umgen_tpu.models.quantize import (init_ema_state,
                                           maybe_kmeans_init)
    st = init_ema_state(jax.random.PRNGKey(0), 4, 8, kmeans_init=True)
    assert not bool(st.initted)
    data = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    st2 = maybe_kmeans_init(st, data, jax.random.PRNGKey(2))
    assert bool(st2.initted)
    norms = np.linalg.norm(np.asarray(st2.embedding), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # idempotent once initted
    st3 = maybe_kmeans_init(st2, data, jax.random.PRNGKey(3))
    assert st3 is st2


def test_diagonal_gaussian():
    from umgen_tpu.models.quantize import DiagonalGaussian
    params = jnp.concatenate([jnp.zeros((2, 3, 3, 4)),
                              jnp.zeros((2, 3, 3, 4))], axis=-1)
    d = DiagonalGaussian(params)
    # standard normal → KL to prior is exactly 0
    np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)
    s = d.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 3, 3, 4)
    # nll of the mode of a standard normal = 0.5*log(2π) per element
    nll = np.asarray(d.nll(d.mode()))
    np.testing.assert_allclose(nll, 0.5 * np.log(2 * np.pi) * 36, rtol=1e-5)
    # deterministic mode: zero kl, sample == mean
    dd = DiagonalGaussian(params, deterministic=True)
    np.testing.assert_allclose(np.asarray(dd.kl()), 0.0)
    np.testing.assert_array_equal(
        np.asarray(dd.sample(jax.random.PRNGKey(0))), np.asarray(d.mode()))


def test_linear_w4_xla_matches_dequant_reference():
    """The wq4 path in modules.linear must compute exactly x @ dequant(w)
    for the group-int4 packing (runtime/quantize._quantize_linear_w4),
    and stay within the documented 4-8% per-matmul envelope of fp."""
    from umgen_tpu.runtime.quantize import _quantize_linear_w4

    rng = np.random.default_rng(0)
    K, N = 256, 96
    w = rng.normal(0, 0.02, (K, N)).astype(np.float32)
    x = rng.normal(0, 1.0, (5, K)).astype(np.float32)
    q = _quantize_linear_w4({"w": jnp.asarray(w)})

    # independent numpy dequant of the packed nibbles
    packed = np.asarray(q["wq4"]).astype(np.int8)
    even = (packed.astype(np.int8) << 4).astype(np.int8) >> 4
    odd = packed >> 4
    qv = np.empty((K, N), np.int8)
    qv[0::2], qv[1::2] = even, odd
    scale = np.asarray(q["ws4"])                 # [K//G, N]
    G = K // scale.shape[0]
    w_deq = qv.astype(np.float32) * np.repeat(scale, G, axis=0)

    y = np.asarray(nn.linear(q, jnp.asarray(x)))
    np.testing.assert_allclose(y, x @ w_deq, atol=2e-5, rtol=1e-5)

    rel = np.linalg.norm(y - x @ w) / np.linalg.norm(x @ w)
    # ~0.12 for N(0, .02) gaussian weights (worst case for symmetric
    # int4 — real trained weights land in the 4-8% envelope)
    assert rel < 0.15, rel


def test_quantize_params_w4_tar_stack_roundtrip():
    """quantize_params_w4 over a stacked TAR tree: structure preserved,
    biases kept, per-layer scan slices feed linear correctly, and the
    block output stays close to fp."""
    from umgen_tpu.runtime.quantize import quantize_params_w4

    D, H, L = 64, 4, 3
    stack = nn.init_stack(jax.random.PRNGKey(0), L, nn.init_block_tar,
                          D, False, jnp.float32)
    params = {"tar": stack}
    qp = quantize_params_w4(params, keys=("tar",))
    assert "wq4" in qp["tar"]["sa1"]["qkv"]
    assert "b" in qp["tar"]["sa1"]["qkv"]        # attention keeps bias
    assert qp["tar"]["sa1"]["qkv"]["wq4"].shape == (L, D // 2, 3 * D)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 6, D))
    full = nn.apply_stack(stack, x, lambda p, h: nn.block_tar(p, h, H))
    quant = nn.apply_stack(qp["tar"], x,
                           lambda p, h: nn.block_tar(p, h, H))
    rel = (np.linalg.norm(np.asarray(quant - full))
           / np.linalg.norm(np.asarray(full)))
    assert rel < 0.15, rel


def test_quantize_params_w4_requantizes_int8():
    """bench applies int8 everywhere first; quantize_params_w4 must
    accept an already-int8 tree (re-quantizing from its dequant)."""
    from umgen_tpu.runtime.quantize import (quantize_params_int8,
                                            quantize_params_w4)

    D = 64
    p = {"tar": {"qkv": nn.init_linear(jax.random.PRNGKey(0), D, 3 * D,
                                       True, jnp.float32)}}
    p8 = quantize_params_int8(p, keys=("tar",))
    assert "wq" in p8["tar"]["qkv"]
    p4 = quantize_params_w4(p8, keys=("tar",))
    assert "wq4" in p4["tar"]["qkv"] and "wq" not in p4["tar"]["qkv"]
    assert "b" in p4["tar"]["qkv"]

    # STACKED leaves ([L, K, N] weights, [L, N] per-channel int8 scales)
    # must broadcast too — the serving-artifact path hit exactly this
    L = 3
    stack = nn.init_stack(jax.random.PRNGKey(1), L, nn.init_block_tar,
                          D, False, jnp.float32)
    s8 = quantize_params_int8({"tar": stack}, keys=("tar",))
    s4 = quantize_params_w4(s8, keys=("tar",))
    assert s4["tar"]["sa1"]["qkv"]["wq4"].shape == (L, D // 2, 3 * D)
    # dequant sanity: w4-from-int8 stays close to the int8 dequant
    w8d = (np.asarray(s8["tar"]["sa1"]["qkv"]["wq"], np.float32)
           * np.asarray(s8["tar"]["sa1"]["qkv"]["ws"],
                        np.float32)[..., None, :])
    x = np.random.default_rng(2).normal(0, 1, (4, D)).astype(np.float32)
    y4 = np.asarray(nn.linear(
        jax.tree.map(lambda a: a[0], s4["tar"]["sa1"]["qkv"]),
        jnp.asarray(x)))
    y8 = x @ w8d[0]
    rel = np.linalg.norm(y4 - y8) / np.linalg.norm(y8)
    assert rel < 0.15, rel
