"""VQGAN tokenizer/detokenizer models (map f8 5-ch, image f16 3-ch) in JAX.

Rebuild of the reference VQ stack (ref:projects/tokenizer/vq_model.py,
vq_modules.py, quantize.py) as channels-last jnp convolutions:

* ``VQDecoder`` — conv_in → mid(resnet, attn, resnet) → upsample tower →
  GroupNorm/swish/conv_out (ref:vq_modules.py:293-415)
* ``VQEncoder`` — the mirror-image downsampling tower (the encode path the
  reference promises in its README; ref:vq_modules.py:179-290)
* ``NormVQ`` — l2-normalized EMA codebook: decode is a plain embedding
  lookup; encode assigns nearest (cosine) code (ref:quantize.py:370-479)

Two factory configs mirror the checkpoints
(ref:vq_model.py:150-202): map = 8192×16 codebook, z=16, ch_mult (1,2,2,4),
attn@16, post-quant 1×1 conv; image = z=256, ch_mult (1,1,2,2,4), attn@32,
post-quant 3×3 conv.  NB the reference's NormVQModel passes its ``stride``
arg into Conv2d's *kernel_size* slot (ref:vq_model.py:137-142) — so "stride
1 / padding 0" really means a 1×1 post-quant conv; we replicate the actual
behavior.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VQConfig:
    n_embed: int = 8192
    embed_dim: int = 16
    z_channels: int = 16
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 5
    out_ch: int = 5
    resolution: int = 256
    post_quant_kernel: int = 1        # map: 1 (pad 0); image: 3 (pad 1)

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)


MAP_VQ = VQConfig()                   # ref:vq_model.py:178-202
IMAGE_VQ = VQConfig(z_channels=256, ch_mult=(1, 1, 2, 2, 4),
                    attn_resolutions=(32,), in_channels=3, out_ch=3,
                    resolution=512, post_quant_kernel=3)


# ---------------------------------------------------------------------------
# primitive ops (NHWC)
# ---------------------------------------------------------------------------
def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def group_norm(p: Params, x: jnp.ndarray, groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    N, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(N, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(N, H, W, C)
    return (xf * p["w"] + p["b"]).astype(x.dtype)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def resnet_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def attn_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head full self-attention over H*W (ref:vq_modules.py:131-176)."""
    N, H, W, C = x.shape
    h = group_norm(p["norm"], x)
    q = conv2d(p["q"], h).reshape(N, H * W, C)
    k = conv2d(p["k"], h).reshape(N, H * W, C)
    v = conv2d(p["v"], h).reshape(N, H * W, C)
    w = jnp.einsum("nqc,nkc->nqk", q, k,
                   preferred_element_type=jnp.float32) * (C ** -0.5)
    w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
    out = jnp.einsum("nqk,nkc->nqc", w, v).reshape(N, H, W, C)
    return x + conv2d(p["proj_out"], out)


def upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    N, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)   # nearest 2x
    return conv2d(p["conv"], x)


def downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """stride-2 conv with torch's asymmetric (0,1,0,1) padding
    (ref:vq_modules.py:43-60)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, padding="VALID")


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def _init_conv(key, cin, cout, k):
    fan = cin * k * k
    w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
    return {"w": w / np.sqrt(fan), "b": jnp.zeros((cout,), jnp.float32)}


def _init_gn(c):
    return {"w": jnp.ones((c,), jnp.float32),
            "b": jnp.zeros((c,), jnp.float32)}


def _init_resnet(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"norm1": _init_gn(cin), "conv1": _init_conv(k1, cin, cout, 3),
         "norm2": _init_gn(cout), "conv2": _init_conv(k2, cout, cout, 3)}
    if cin != cout:
        p["nin_shortcut"] = _init_conv(k3, cin, cout, 1)
    return p


def _init_attn(key, c):
    ks = jax.random.split(key, 4)
    return {"norm": _init_gn(c),
            "q": _init_conv(ks[0], c, c, 1), "k": _init_conv(ks[1], c, c, 1),
            "v": _init_conv(ks[2], c, c, 1),
            "proj_out": _init_conv(ks[3], c, c, 1)}


def init_decoder(key, cfg: VQConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    block_in = cfg.ch * cfg.ch_mult[-1]
    curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
    p: Params = {
        "conv_in": _init_conv(nk(), cfg.z_channels, block_in, 3),
        "mid": {
            "block_1": _init_resnet(nk(), block_in, block_in),
            "attn_1": _init_attn(nk(), block_in),
            "block_2": _init_resnet(nk(), block_in, block_in),
        },
        "up": [],
    }
    ups: List[Params] = [None] * cfg.num_resolutions
    for i_level in reversed(range(cfg.num_resolutions)):
        blocks, attns = [], []
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(_init_resnet(nk(), block_in, block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attns.append(_init_attn(nk(), block_in))
        up = {"block": blocks, "attn": attns}
        if i_level != 0:
            up["upsample"] = {"conv": _init_conv(nk(), block_in, block_in, 3)}
            curr_res *= 2
        ups[i_level] = up
    p["up"] = ups
    p["norm_out"] = _init_gn(block_in)
    p["conv_out"] = _init_conv(nk(), block_in, cfg.out_ch, 3)
    return p


def init_encoder(key, cfg: VQConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    p: Params = {"conv_in": _init_conv(nk(), cfg.in_channels, cfg.ch, 3),
                 "down": []}
    curr_res = cfg.resolution
    in_mult = (1,) + tuple(cfg.ch_mult)
    block_in = cfg.ch
    for i_level in range(cfg.num_resolutions):
        blocks, attns = [], []
        block_in = cfg.ch * in_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        for _ in range(cfg.num_res_blocks):
            blocks.append(_init_resnet(nk(), block_in, block_out))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                attns.append(_init_attn(nk(), block_in))
        down = {"block": blocks, "attn": attns}
        if i_level != cfg.num_resolutions - 1:
            down["downsample"] = {"conv": _init_conv(nk(), block_in,
                                                     block_in, 3)}
            curr_res //= 2
        p["down"].append(down)
    p["mid"] = {
        "block_1": _init_resnet(nk(), block_in, block_in),
        "attn_1": _init_attn(nk(), block_in),
        "block_2": _init_resnet(nk(), block_in, block_in),
    }
    p["norm_out"] = _init_gn(block_in)
    p["conv_out"] = _init_conv(nk(), block_in, cfg.z_channels, 3)
    return p


def init_normvq(key, cfg: VQConfig) -> Params:
    """Full model: encoder + decoder + codebook + quant convs."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    emb = jax.random.normal(k3, (cfg.n_embed, cfg.embed_dim), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return {
        "encoder": init_encoder(k1, cfg),
        "decoder": init_decoder(k2, cfg),
        "codebook": emb,
        "quant_conv": _init_conv(k4, cfg.z_channels, cfg.embed_dim, 1),
        "post_quant_conv": _init_conv(k5, cfg.embed_dim, cfg.z_channels,
                                      cfg.post_quant_kernel),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def decoder_forward(p: Params, cfg: VQConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z [N, h, w, z_channels] → image [N, H, W, out_ch]."""
    h = conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i_level in reversed(range(cfg.num_resolutions)):
        up = p["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(up["block"][i_block], h)
            if up["attn"]:
                h = attn_block(up["attn"][i_block], h)
        if i_level != 0:
            h = upsample(up["upsample"], h)
    h = swish(group_norm(p["norm_out"], h))
    return conv2d(p["conv_out"], h)


def encoder_forward(p: Params, cfg: VQConfig, x: jnp.ndarray) -> jnp.ndarray:
    """image [N, H, W, in_ch] → z [N, h, w, z_channels]."""
    h = conv2d(p["conv_in"], x)
    for i_level in range(cfg.num_resolutions):
        down = p["down"][i_level]
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(down["block"][i_block], h)
            if down["attn"]:
                h = attn_block(down["attn"][i_block], h)
        if i_level != cfg.num_resolutions - 1:
            h = downsample(down["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = swish(group_norm(p["norm_out"], h))
    return conv2d(p["conv_out"], h)


def decode_code(p: Params, cfg: VQConfig, indices: jnp.ndarray
                ) -> jnp.ndarray:
    """VQ indices [N, h, w] → image [N, H, W, out_ch]
    (ref:vq_model.py:92-96)."""
    quant = p["codebook"][indices]                      # [N, h, w, e]
    z = conv2d(p["post_quant_conv"], quant)
    return decoder_forward(p["decoder"], cfg, z)


def encode_to_indices(p: Params, cfg: VQConfig, x: jnp.ndarray
                      ) -> jnp.ndarray:
    """image [N, H, W, in_ch] → VQ indices [N, h, w] via l2-normalized
    nearest-code assignment (ref:quantize.py:414-431)."""
    z = encoder_forward(p["encoder"], cfg, x)
    z = conv2d(p["quant_conv"], z)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    emb = p["codebook"]
    d = (jnp.sum(z ** 2, axis=-1, keepdims=True)
         + jnp.sum(emb ** 2, axis=-1)
         - 2 * jnp.einsum("nhwc,ec->nhwe", z, emb))
    return jnp.argmin(d, axis=-1)


# ---------------------------------------------------------------------------
# FSQ — finite scalar quantization (ref:quantize.py:230-288; present in the
# reference's quantizer zoo though the shipped checkpoints use NormEMA)
# ---------------------------------------------------------------------------
class FSQ:
    """Finite Scalar Quantizer (https://arxiv.org/abs/2309.15505 recipe)."""

    def __init__(self, levels: Sequence[int]):
        self.levels = jnp.asarray(levels, jnp.int32)
        basis = np.concatenate(
            [[1], np.cumprod(np.asarray(levels[:-1]))]).astype(np.int64)
        self.basis = jnp.asarray(basis)
        self.n_codes = int(np.prod(levels))

    def _bound(self, z):
        lv = self.levels.astype(jnp.float32)
        half = (lv - 1) * (1 + 1e-3) / 2
        offset = jnp.where(self.levels % 2 == 0, 0.5, 0.0)
        shift = jnp.tan(offset / half)
        return jnp.tanh(z + shift) * half - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """(..., d) → quantized values in the same space (straight-through
        rounding on the bounded lattice)."""
        zb = self._bound(z)
        q = jnp.round(zb)
        q = zb + jax.lax.stop_gradient(q - zb)
        half_width = self.levels.astype(jnp.float32) // 2
        return q / half_width

    def codes_to_indices(self, zhat: jnp.ndarray) -> jnp.ndarray:
        half_width = self.levels.astype(jnp.float32) // 2
        centered = zhat * half_width + half_width
        return jnp.sum(centered.astype(jnp.int64) * self.basis,
                       axis=-1).astype(jnp.int32)

    def indices_to_codes(self, idx: jnp.ndarray) -> jnp.ndarray:
        half_width = self.levels.astype(jnp.float32) // 2
        codes = (idx[..., None] // self.basis) % self.levels
        return (codes.astype(jnp.float32) - half_width) / half_width


# ---------------------------------------------------------------------------
# detokenizer front-ends (ref:tools/decode_map.py:110-183)
# ---------------------------------------------------------------------------
def to_rgb(x: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
    """Random 1x1-conv projection of the 5-channel map raster to RGB,
    normalized to [-1, 1] (ref:decode_map.py:25-30 uses
    torch.manual_seed(0) + randn — we use a fixed jax key; output is for
    visualization only)."""
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (1, 1, x.shape[-1], 3), x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    lo, hi = y.min(), y.max()
    return 2.0 * (y - lo) / (hi - lo) - 1.0


class NormVQTokenizer:
    """Image/raster ↔ VQ-token codec — the encode-path API the reference
    promises (ref:tokenizer/base.py QuantizedToken + vq_tokenizer.py
    NormVQModelTokenizer).

    encode: [N, H, W, C] in [-1, 1] → indices [N, h, w]
    decode: indices → reconstruction [N, H, W, C]
    """

    def __init__(self, cfg: VQConfig, params: Optional[Params] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.params = params or init_normvq(jax.random.PRNGKey(seed), cfg)
        self._encode = jax.jit(functools.partial(encode_to_indices,
                                                 self.params, cfg))
        self._decode = jax.jit(functools.partial(decode_code, self.params,
                                                 cfg))

    def encode(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._encode(jnp.asarray(images)))

    def decode(self, indices: np.ndarray) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(indices)))

    def roundtrip(self, images: np.ndarray) -> np.ndarray:
        return self.decode(self.encode(images))


class MapDecoder:
    """map tokens (T, 1024) → RGB rasters (T, 256, 256, 3) in [-1, 1]."""

    def __init__(self, params: Optional[Params] = None, seed: int = 0):
        self.cfg = MAP_VQ
        self.params = params or init_normvq(jax.random.PRNGKey(seed),
                                            self.cfg)
        self._decode = jax.jit(functools.partial(decode_code, self.params,
                                                 self.cfg))

    def decode(self, tokens: np.ndarray, chunk: int = 20) -> np.ndarray:
        tokens = np.asarray(tokens).reshape(-1, 32, 32)
        outs = []
        for i in range(0, tokens.shape[0], chunk):
            rec = self._decode(jnp.asarray(tokens[i:i + chunk]))
            outs.append(np.asarray(to_rgb(rec)))
        return np.concatenate(outs, axis=0)


class ImageDecoder:
    """image tokens (T, 512) → images (T, 256, 512, 3) in [-1, 1]."""

    def __init__(self, params: Optional[Params] = None, seed: int = 0):
        self.cfg = IMAGE_VQ
        self.params = params or init_normvq(jax.random.PRNGKey(seed),
                                            self.cfg)
        self._decode = jax.jit(functools.partial(decode_code, self.params,
                                                 self.cfg))

    def decode(self, tokens: np.ndarray, chunk: int = 20) -> np.ndarray:
        tokens = np.asarray(tokens).reshape(-1, 16, 32)
        outs = []
        for i in range(0, tokens.shape[0], chunk):
            outs.append(np.asarray(self._decode(
                jnp.asarray(tokens[i:i + chunk]))))
        return np.concatenate(outs, axis=0)
