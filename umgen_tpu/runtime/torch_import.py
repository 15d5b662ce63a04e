"""Torch checkpoint → JAX pytree importers.

Maps the reference checkpoints onto this framework's param trees:

* ``import_umgen`` — `UMGen_Large.pt` DeepSpeed-format state dict
  (ref:projects/tools/infer_fun.py:43-50 loads
  checkpoint["model_state"]["module"], strict=False; naming from
  ref:UMGen.py:176-245).  Handles the bias quirk (attention projections
  HAVE biases, MLPs don't) and torch's [out, in] linear layout → our
  [in, out].
* ``import_vq`` — `map_vae.ckpt` / `image_vae.tar` VQGAN weights
  (ref:vq_model.py:65-78 loads sd["state_dict"]): conv OIHW → HWIO,
  1×1 attention convs kept as convs, `quantize.embedding.weight` →
  codebook.

Torch is only required when actually importing; the framework itself never
depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

Params = Dict[str, Any]


def _t(x) -> np.ndarray:
    """torch tensor → numpy (no grad, cpu, fp32-preserving)."""
    return np.asarray(x.detach().cpu().float().numpy())


def _linear(sd, name, transpose=True) -> Params:
    p = {"w": _t(sd[f"{name}.weight"]).T if transpose
         else _t(sd[f"{name}.weight"])}
    b = sd.get(f"{name}.bias")
    if b is not None:
        p["b"] = _t(b)
    return p


def _ln(sd, name) -> Params:
    return {"w": _t(sd[f"{name}.weight"])}


def _attn(sd, name) -> Params:
    return {"qkv": _linear(sd, f"{name}.c_attn"),
            "proj": _linear(sd, f"{name}.c_proj")}


def _mlp(sd, name) -> Params:
    return {"fc": _linear(sd, f"{name}.c_fc"),
            "proj": _linear(sd, f"{name}.c_proj")}


def _block_tar(sd, name) -> Params:
    return {
        "ln1": _ln(sd, f"{name}.ln_1"),
        "sa1": _attn(sd, f"{name}.spatial_attn_1"),
        "ln2": _ln(sd, f"{name}.ln_2"),
        "mlp1": _mlp(sd, f"{name}.mlp1"),
        "ln3": _ln(sd, f"{name}.ln_3"),
        "ta": _attn(sd, f"{name}.temporal_attn"),
        "ln4": _ln(sd, f"{name}.ln_4"),
        "mlp2": _mlp(sd, f"{name}.mlp2"),
        "ln5": _ln(sd, f"{name}.ln_5"),
        "sa2": _attn(sd, f"{name}.spatial_attn_2"),
        "ln6": _ln(sd, f"{name}.ln_6"),
        "mlp3": _mlp(sd, f"{name}.mlp3"),
    }


def _block_oar(sd, name) -> Params:
    return {
        "ln1": _ln(sd, f"{name}.ln_1"),
        "attn": _attn(sd, f"{name}.temporal_attn"),
        "ln2": _ln(sd, f"{name}.ln_2"),
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _decoder_block(sd, name) -> Params:
    # FlashCrossAttention names its projections q/k/v_attn
    # (ref:module.py:459-471, what trained checkpoints carry); the manual
    # CrossAttention fallback names them q/k/v_attn_wp (ref:module.py:525-533)
    ca = f"{name}.cross_attn"
    sfx = "" if f"{ca}.q_attn.weight" in sd else "_wp"
    return {
        "ln1": _ln(sd, f"{name}.ln_1"),
        "self_attn": _attn(sd, f"{name}.self_attn"),
        "ln2": _ln(sd, f"{name}.ln_2"),
        "ln3": _ln(sd, f"{name}.ln_3"),
        "cross_attn": {
            "q": _linear(sd, f"{ca}.q_attn{sfx}"),
            "k": _linear(sd, f"{ca}.k_attn{sfx}"),
            "v": _linear(sd, f"{ca}.v_attn{sfx}"),
            "proj": _linear(sd, f"{ca}.c_proj"),
        },
        "ln4": _ln(sd, f"{name}.ln_4"),
        "mlp": _mlp(sd, f"{name}.mlp1"),
    }


def _stack(layers) -> Params:
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def extract_state_dict(checkpoint) -> Dict[str, Any]:
    """Unwrap the DeepSpeed container (ref:infer_fun.py:43-50)."""
    if "model_state" in checkpoint:
        checkpoint = checkpoint["model_state"]
    if "module" in checkpoint:
        checkpoint = checkpoint["module"]
    return checkpoint


def import_umgen(state_dict: Dict[str, Any], config) -> Params:
    """Reference state dict → UMGen param pytree (buffers excluded)."""
    sd = state_dict
    tr = "transformer"
    params: Params = {
        "egoe": _t(sd[f"{tr}.egoe.weight"]),
        "axe": _t(sd[f"{tr}.axe.weight"]),
        "be": _t(sd[f"{tr}.be.weight"]),
        "tpe": _t(sd[f"{tr}.tpe.weight"]),
        # the torch reference has no relative temporal-PE table; emit the
        # neutral (all-zero) one so imported trees are structurally
        # identical to native init (absolute mode never reads it)
        "tpe_rel": np.zeros((config.n_head, config.max_frame_len),
                            np.float32),
        "spe": _t(sd[f"{tr}.spe.weight"]),
        "tske": _t(sd[f"{tr}.tske.weight"]),
        "map_mlp_pre": _mlp(sd, "map_mlp_pre"),
        "ln_tar": _ln(sd, f"{tr}.ln_tar"),
        "ln_oar": _ln(sd, f"{tr}.ln_oar"),
        "ln_ego_tar": _ln(sd, f"{tr}.ln_ego_tar"),
        "ln_ego": _ln(sd, f"{tr}.ln_ego"),
        "tar": _stack([_block_tar(sd, f"{tr}.TAR.{i}")
                       for i in range(config.n_tar_layer)]),
        "oar": _stack([_block_oar(sd, f"{tr}.OAR.{i}")
                       for i in range(config.n_oar_layer)]),
        "ego_tar": _stack([_block_tar(sd, f"{tr}.ego_tar.{i}")
                           for i in range(config.n_ego_tar_layer)]),
        "ego_ca": _stack([_decoder_block(sd, f"{tr}.ego_cross_attn.{i}")
                          for i in range(config.n_ego_ca_layer)]),
        "head_tar_aux": _linear(sd, f"{tr}.head_tar_aux"),
        "head_tar_pose": _linear(sd, f"{tr}.head_tar_pose"),
        "head_tar_map": _linear(sd, f"{tr}.head_tar_map"),
        "head_ar_aux": _linear(sd, f"{tr}.head_ar_aux"),
        "head_ar_pose": _linear(sd, f"{tr}.head_ar_pose"),
        "head_ar_map": _linear(sd, f"{tr}.head_ar_map"),
        "head_ar_bbox3d": _linear(sd, f"{tr}.head_ar_bbox3d"),
        "head_ego": _linear(sd, f"{tr}.head_ego"),
    }
    if getattr(config, "n_step", 1) > 1:
        # widened multi-step bbox TAR head replaces head_tar_bbox3d
        # (ref:UMGen.py:221-226)
        params["head_tar_n_step_bbox3d"] = _linear(
            sd, f"{tr}.head_tar_n_step_bbox3d")
    else:
        params["head_tar_bbox3d"] = _linear(sd, f"{tr}.head_tar_bbox3d")
    if config.split_map_tar:
        params["map_tar"] = _stack([_block_tar(sd, f"{tr}.map_tar.{i}")
                                    for i in range(config.n_map_tar_layer)])
        params["ln_map_tar"] = _ln(sd, f"{tr}.ln_map_tar")
    if config.sample_img:
        params["head_tar_img"] = _linear(sd, f"{tr}.head_tar_img")
        params["head_ar_img"] = _linear(sd, f"{tr}.head_ar_img")
        params["img_mlp_pre"] = _mlp(sd, "img_mlp_pre")
        if config.split_box_tar:
            params["box_tar"] = _stack(
                [_block_tar(sd, f"{tr}.box_tar.{i}")
                 for i in range(config.n_box_tar_layer)])
            params["ln_box_tar"] = _ln(sd, f"{tr}.ln_box_tar")
    return params


def load_umgen_checkpoint(path: str, config,
                          pipeline=None,
                          map_codebook_path: Optional[str] = None,
                          img_codebook_path: Optional[str] = None) -> Params:
    """Load + convert the full reference checkpoint, attaching buffers."""
    import torch

    import jax.numpy as jnp
    from umgen_tpu.models.umgen import build_buffers

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    params = import_umgen(extract_state_dict(ckpt), config)

    map_cb = img_cb = None
    if map_codebook_path:
        map_cb = _t(torch.load(map_codebook_path, map_location="cpu",
                               weights_only=False))
    if img_codebook_path:
        img_cb = _t(torch.load(img_codebook_path, map_location="cpu",
                               weights_only=False))
    params["buffers"] = build_buffers(config, pipeline=pipeline,
                                      map_codebook=map_cb,
                                      img_codebook=img_cb)
    dt = jnp.dtype(config.dtype)
    import jax
    return jax.tree.map(
        lambda a: jnp.asarray(a, dt) if np.issubdtype(
            np.asarray(a).dtype, np.floating) else jnp.asarray(a), params)


# ---------------------------------------------------------------------------
# VQGAN import
# ---------------------------------------------------------------------------
def _conv(sd, name) -> Params:
    return {"w": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "b": _t(sd[f"{name}.bias"])}


def _gn(sd, name) -> Params:
    return {"w": _t(sd[f"{name}.weight"]), "b": _t(sd[f"{name}.bias"])}


def _vq_resnet(sd, name) -> Params:
    p = {"norm1": _gn(sd, f"{name}.norm1"),
         "conv1": _conv(sd, f"{name}.conv1"),
         "norm2": _gn(sd, f"{name}.norm2"),
         "conv2": _conv(sd, f"{name}.conv2")}
    if f"{name}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv(sd, f"{name}.nin_shortcut")
    return p


def _vq_attn(sd, name) -> Params:
    return {"norm": _gn(sd, f"{name}.norm"),
            "q": _conv(sd, f"{name}.q"), "k": _conv(sd, f"{name}.k"),
            "v": _conv(sd, f"{name}.v"),
            "proj_out": _conv(sd, f"{name}.proj_out")}


def import_vq(state_dict: Dict[str, Any], cfg) -> Params:
    """VQGAN state dict (ref:vq_model.py NormVQModel) → NormVQ pytree."""
    sd = state_dict
    n_res = cfg.num_resolutions

    def tower(prefix, n_blocks, io_levels, sub):
        levels = []
        for i in io_levels:
            lvl = {"block": [], "attn": []}
            for j in range(n_blocks):
                bname = f"{prefix}.{i}.block.{j}"
                if f"{bname}.conv1.weight" not in sd:
                    break
                lvl["block"].append(_vq_resnet(sd, bname))
                aname = f"{prefix}.{i}.attn.{j}"
                if f"{aname}.q.weight" in sd:
                    lvl["attn"].append(_vq_attn(sd, aname))
            extra = f"{prefix}.{i}.{sub}.conv.weight"
            if extra in sd:
                lvl[sub] = {"conv": _conv(sd, f"{prefix}.{i}.{sub}.conv")}
            levels.append(lvl)
        return levels

    def mid(prefix):
        return {"block_1": _vq_resnet(sd, f"{prefix}.mid.block_1"),
                "attn_1": _vq_attn(sd, f"{prefix}.mid.attn_1"),
                "block_2": _vq_resnet(sd, f"{prefix}.mid.block_2")}

    params: Params = {
        "decoder": {
            "conv_in": _conv(sd, "decoder.conv_in"),
            "mid": mid("decoder"),
            "up": tower("decoder.up", cfg.num_res_blocks + 1,
                        range(n_res), "upsample"),
            "norm_out": _gn(sd, "decoder.norm_out"),
            "conv_out": _conv(sd, "decoder.conv_out"),
        },
        "codebook": _t(sd["quantize.embedding.weight"]),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
    if "encoder.conv_in.weight" in sd:
        params["encoder"] = {
            "conv_in": _conv(sd, "encoder.conv_in"),
            "down": tower("encoder.down", cfg.num_res_blocks,
                          range(n_res), "downsample"),
            "mid": mid("encoder"),
            "norm_out": _gn(sd, "encoder.norm_out"),
            "conv_out": _conv(sd, "encoder.conv_out"),
        }
        params["quant_conv"] = _conv(sd, "quant_conv")
    return params


def load_vq_checkpoint(path: str, cfg) -> Params:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return import_vq(sd, cfg)
