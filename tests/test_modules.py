import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.models import modules as nn

KEY = jax.random.PRNGKey(0)
D, H = 32, 4


def test_layer_norm_matches_torch():
    import torch
    x = np.random.default_rng(0).normal(size=(2, 5, D)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(D,)).astype(np.float32)
    ours = nn.layer_norm({"w": jnp.asarray(w)}, jnp.asarray(x))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (D,), torch.from_numpy(w), None, 1e-5)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_rms_norm_matches_torch():
    """Llama-style RMSNorm vs a direct torch transcription of the
    reference implementation (ref:module.py:40-81)."""
    import torch
    x = np.random.default_rng(0).normal(size=(2, 5, D)).astype(np.float32)
    w = np.random.default_rng(1).normal(size=(D,)).astype(np.float32)
    ours = nn.rms_norm({"w": jnp.asarray(w)}, jnp.asarray(x))
    xt = torch.from_numpy(x)
    theirs = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
              ) * torch.from_numpy(w)
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


def test_gelu_matches_torch():
    import torch
    x = np.linspace(-3, 3, 64, dtype=np.float32)
    ours = nn.gelu(jnp.asarray(x))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-6)


def test_attention_matches_manual_torch():
    """Cross-check the fused-QKV attention against an independent torch
    implementation of pre-softmax-scaled causal attention."""
    import torch
    rng = np.random.default_rng(2)
    B, S = 2, 7
    x = rng.normal(size=(B, S, D)).astype(np.float32)
    qkv_w = rng.normal(size=(D, 3 * D)).astype(np.float32) * 0.1
    qkv_b = rng.normal(size=(3 * D,)).astype(np.float32) * 0.1
    pw = rng.normal(size=(D, D)).astype(np.float32) * 0.1
    pb = rng.normal(size=(D,)).astype(np.float32) * 0.1
    p = {"qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
         "proj": {"w": jnp.asarray(pw), "b": jnp.asarray(pb)}}

    for causal in (True, False):
        ours = nn.attention(p, jnp.asarray(x), n_head=H, causal=causal)

        xt = torch.from_numpy(x)
        qkv = xt @ torch.from_numpy(qkv_w) + torch.from_numpy(qkv_b)
        q, k, v = qkv.split(D, dim=-1)
        q = q.view(B, S, H, D // H).transpose(1, 2)
        k = k.view(B, S, H, D // H).transpose(1, 2)
        v = v.view(B, S, H, D // H).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / np.sqrt(D // H)
        if causal:
            mask = torch.tril(torch.ones(S, S)) == 0
            att = att.masked_fill(mask, float("-inf"))
        y = (att.softmax(-1) @ v).transpose(1, 2).reshape(B, S, D)
        theirs = y @ torch.from_numpy(pw) + torch.from_numpy(pb)
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=2e-5)


def test_causality():
    p = nn.init_attention(KEY, D, False, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, D))
    y1 = nn.attention(p, x, n_head=H, causal=True)
    x2 = x.at[0, 4:].set(99.0)   # perturb the future
    y2 = nn.attention(p, x2, n_head=H, causal=True)
    np.testing.assert_allclose(np.asarray(y1[0, :4]), np.asarray(y2[0, :4]),
                               atol=1e-5)


def test_kv_cache_decode_matches_full_forward():
    """Incremental decode with the preallocated KV ring must reproduce the
    full causal forward token-for-token."""
    p = nn.init_block_oar(KEY, D, False, jnp.float32)
    S, B = 9, 2
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D))
    full = nn.block_oar(p, x, n_head=H, causal=True)

    S_max = 16
    kv = (jnp.zeros((B, S_max, H, D // H)), jnp.zeros((B, S_max, H, D // H)))
    outs = []
    for i in range(S):
        y, kv = nn.block_oar_decode(p, x[:, i:i + 1], H, kv, jnp.int32(i))
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-4)


def test_decode_alignment_bottom_right():
    """Causal attention with q shorter than k must align bottom-right."""
    p = nn.init_attention(KEY, D, False, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, D))
    full = nn.attention(p, x, n_head=H, causal=True)

    # feed prefix as kv, last two tokens as queries via sdpa directly
    qkv = nn.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda a: a.reshape(1, 8, H, D // H)
    y = nn.sdpa(sh(q)[:, 6:], sh(k), sh(v), causal=True)
    y = nn.linear(p["proj"], y.reshape(1, 2, D))
    np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, 6:]),
                               atol=1e-5)


def test_block_tar_temporal_causality_and_spatial_mixing():
    p = nn.init_block_tar(KEY, D, False, jnp.float32)
    B, T, S = 1, 4, 6
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, S, D))
    y1 = nn.block_tar(p, x, n_head=H)
    # perturbing a future frame must not change earlier frames
    x2 = x.at[:, 3].set(-5.0)
    y2 = nn.block_tar(p, x2, n_head=H)
    np.testing.assert_allclose(np.asarray(y1[:, :3]), np.asarray(y2[:, :3]),
                               atol=1e-5)
    # perturbing one position within a frame changes others in that frame
    x3 = x.at[:, 0, 0].set(7.0)
    y3 = nn.block_tar(p, x3, n_head=H)
    assert not np.allclose(np.asarray(y1[:, 0, 1]), np.asarray(y3[:, 0, 1]))


def test_apply_stack_matches_loop():
    stack = nn.init_stack(KEY, 3, nn.init_block_oar, D, False, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 5, D))
    fn = functools.partial(nn.block_oar, n_head=H)
    y_scan = nn.apply_stack(stack, x, lambda p, h: fn(p, h))
    y_loop = x
    for i in range(3):
        layer = jax.tree.map(lambda a: a[i], stack)
        y_loop = fn(layer, y_loop)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_loop),
                               atol=1e-5)


def test_position_encoding_matches_reference_formula():
    """Independent recomputation of the sinusoid table
    (ref:module.py:746-768)."""
    n, d = 16, 8
    got = nn.position_encoding_init(n, d, start_index=3)
    exp = np.array([
        [(pos + 3) / np.power(10000, 2 * (j // 2) / d) for j in range(d)]
        if pos != 0 else np.zeros(d)
        for pos in range(n)
    ])
    exp[1:, 0::2] = np.sin(exp[1:, 0::2])
    exp[1:, 1::2] = np.cos(exp[1:, 1::2])
    np.testing.assert_allclose(got, exp.astype(np.float32), atol=1e-6)
    assert np.all(got[0] == 0)
