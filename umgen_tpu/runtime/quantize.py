"""Weight-only int8 quantization for decode-bound stacks.

The OAR decode streams ~510 MB of bf16 weights per token step at the larger
scale — the hard bandwidth floor of sequential decoding.  Per-output-channel
symmetric int8 halves that traffic; dequantization happens in VMEM and fuses
into the matmul.  Applied selectively (default: the OAR stack and the AR
heads) so the TAR cascade — matmul-throughput-bound, not weight-bound —
stays bf16.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def _quantize_linear(p: Params) -> Params:
    """{"w": [..., in, out], "b"?} → {"wq": int8, "ws": scales, "b"?}."""
    w = np.asarray(p["w"], dtype=np.float32)
    amax = np.max(np.abs(w), axis=-2, keepdims=True)       # per out channel
    scale = np.maximum(amax / 127.0, 1e-8)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    out = {"wq": jnp.asarray(wq),
           "ws": jnp.asarray(np.squeeze(scale, axis=-2), jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


DECODE_KEYS = ("oar", "head_ar_map", "head_ar_img", "head_ar_bbox3d",
               "head_ar_pose", "head_ar_aux")
ALL_STACK_KEYS = DECODE_KEYS + (
    "tar", "map_tar", "box_tar", "ego_tar", "ego_ca", "map_mlp_pre",
    "img_mlp_pre", "head_tar_map", "head_tar_img", "head_tar_bbox3d",
    "head_tar_n_step_bbox3d", "head_tar_pose", "head_tar_aux", "head_ego")
# the TAR-family stacks are ~2.0 GB of the 2.4 GB int8 total at the
# larger scale — the W4 target when ring memory, not weight bandwidth,
# is the constraint (B=5 at the full 20-frame window misses HBM by
# 49.5 MB with everything else int4/int8 — r5b measurement)
TAR_STACK_KEYS = ("tar", "map_tar", "box_tar", "ego_tar", "ego_ca")


def _quantize_linear_w4(p: Params, group: int = 128) -> Params:
    """{"w": [..., in, out]} → {"wq4": packed int4 [..., in//2, out],
    "ws4": group scales [..., in//group, out]} for the XLA dequant path
    (models/modules.linear).  Group-`group` symmetric int4 along the
    input dim — the same arithmetic as the fused kernel's W4A8 weights
    (ops/decode_kernel._quantize_w4_groups), stored nibble-packed along
    the input dim so a layer-scan slice dequantizes to [in, out] with one
    shift-pair + interleave."""
    w = np.asarray(p["w"], dtype=np.float32)
    *lead, K, N = w.shape
    G = min(group, K)
    wg = w.reshape(*lead, K // G, G, N)
    amax = np.abs(wg).max(axis=-2, keepdims=True)
    scale = np.maximum(amax / 7.0, 1e-8)
    q = np.clip(np.round(wg / scale), -7, 7).astype(np.int8)
    q = q.reshape(*lead, K, N)
    packed = ((q[..., 1::2, :] << 4)
              | (q[..., 0::2, :] & 0x0F)).astype(np.int8)
    out = {"wq4": jnp.asarray(packed),
           "ws4": jnp.asarray(np.squeeze(scale, axis=-2), jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_params_w4(params: Params,
                       keys: Iterable[str] = TAR_STACK_KEYS) -> Params:
    """Group-128 int4 weights for the selected subtrees, served by the
    XLA dequant path (no fused kernel required — the TAR cascade has
    none).  Halves the selected stacks' HBM vs int8; per-matmul rel err
    4-8% (the same envelope as the fused W4A8 OAR weights)."""
    LINEAR_NAMES = {"qkv", "proj", "fc", "q", "k", "v"}
    out = dict(params)
    for key in keys:
        if key not in params:
            continue

        def walk(t, name):
            if isinstance(t, dict):
                if "w" in t and (name in LINEAR_NAMES
                                 or name.startswith("head_")):
                    return _quantize_linear_w4(t)
                if "wq" in t and (name in LINEAR_NAMES
                                  or name.startswith("head_")):
                    # already int8: re-quantize from the dequantized int8
                    # values (bench applies int8 everywhere first).
                    # ws is per-out-channel [..., N] against wq
                    # [..., K, N] — broadcast over the input dim
                    w = (np.asarray(t["wq"], np.float32)
                         * np.asarray(t["ws"], np.float32)[..., None, :])
                    keep = {"w": w}
                    if "b" in t:
                        keep["b"] = t["b"]
                    return _quantize_linear_w4(keep)
                return {k: walk(v, k) for k, v in t.items()}
            return t

        out[key] = walk(params[key], key)
    return out


def quantize_params_int8(params: Params,
                         keys: Iterable[str] = DECODE_KEYS) -> Params:
    """Return params with the selected subtrees' linear weights in int8.

    Default: the decode-bound OAR stack + AR heads.  Pass ALL_STACK_KEYS to
    also quantize the TAR cascade (halves total param memory — enables
    batch-2 cached rollouts at the full 20-frame window on one chip)."""
    LINEAR_NAMES = {"qkv", "proj", "fc", "q", "k", "v"}
    out = dict(params)
    for key in keys:
        if key not in params:
            continue
        sub = params[key]

        def walk(t, name):
            if isinstance(t, dict):
                if "w" in t and (name in LINEAR_NAMES
                                 or name.startswith("head_")):
                    return _quantize_linear(t)
                return {k: walk(v, k) for k, v in t.items()}
            return t

        out[key] = walk(sub, key)
    return out


def pack_fused(params: Params, kv_dtype: str = "int8",
               version: str = "v3") -> Params:
    """Add ``oar_packed`` blocks for the fused decode kernels.

    Requires the OAR stack to be int8-quantized first
    (:func:`quantize_params_int8`).  The packed copy adds ~262 MB on
    device; the kernel streams it instead of the per-tensor OAR leaves.

    int8 KV caches use the v3 multi-stream packing by default — clean
    steady-state measurement (scripts/bench_decode_kernel.py, full
    2208-row cache) has v3 at 2.22/3.71 ms per step (B=1/2) vs v4 at
    5.6/7.2 ms: v4's whole-batch [B*bs, B*H] attention and six-stream
    split LOSE to v3's per-scene MXU dots on v5e.  ``version="v4"``
    keeps the experiment reachable.  Non-int8 caches use the v2 burst
    packing (the only kernel that accepts bf16/fp8 storage).
    """
    from umgen_tpu.ops.decode_kernel import (pack_fused_oar,
                                             pack_fused_oar_v4)
    if "wq" not in params["oar"]["attn"]["qkv"]:
        raise ValueError("pack_fused requires int8-quantized OAR params "
                         "(run quantize_params_int8 first)")
    out = dict(params)
    if kv_dtype == "int8" and version == "v4":
        out["oar_packed"] = pack_fused_oar_v4(params["oar"])
    else:
        out["oar_packed"] = pack_fused_oar(params["oar"])
    return out


def pack_fused_w4(params: Params, raw_oar: Params) -> Params:
    """Add the W4A8 ``oar_packed`` blocks (kernel: fused_decode_step_w4).

    ``raw_oar``: the UN-quantized OAR subtree (original fp32/bf16 "w"
    leaves) — int4 group quantization must start from the raw weights,
    not the int8 ones.  The rest of ``params`` may already be int8.
    """
    from umgen_tpu.ops.decode_kernel import pack_fused_oar_w4
    out = dict(params)
    out["oar_packed"] = pack_fused_oar_w4(raw_oar)
    return out
