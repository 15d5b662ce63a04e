"""The UMGen-class world model: params, embeddings, TAR cascade, ego net.

Functional rebuild of ref:projects/models/UMGen.py as pure functions over a
param pytree.  The OAR decode loop lives in umgen_tpu.models.rollout; this
module provides everything up to the per-frame priors:

  * token/positional/task embeddings and frozen VQ-codebook projections
  * the trunk TAR (36 blocks over all four modalities), the per-modality
    refinement TARs (map 24, box 24) and the ego network (12 TAR blocks +
    12 cross-attention decoder blocks over 3 learned ego queries)
  * action-aware map alignment (in-graph affine warp) driven by an in-graph
    pose decode (the reference round-trips pose tokens through the CPU every
    frame, ref:UMGen.py:1008-1024 — here it is a [1024]-table lookup fused
    into the same XLA program)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umgen_tpu.config import MAP_HW, TASK_NAME_ID, TASKS, ModelConfig
from umgen_tpu.data.pipeline import ScenePipeline
from umgen_tpu.layout import SequenceLayout
from umgen_tpu.models import modules as nn
from umgen_tpu.ops.warp import affine_warp_map

Params = Dict[str, Any]


def _dt(config: ModelConfig):
    return jnp.dtype(config.dtype)


# ---------------------------------------------------------------------------
# constant (non-trained) buffers
# ---------------------------------------------------------------------------
def build_buffers(config: ModelConfig,
                  pipeline: Optional[ScenePipeline] = None,
                  map_codebook: Optional[np.ndarray] = None,
                  img_codebook: Optional[np.ndarray] = None,
                  rng: Optional[np.random.Generator] = None) -> Params:
    """Frozen tables: sinusoidal PEs, VQ codebooks, decode constants.

    * fouier_pe [1024, d] — pose-token embedding table, built in float64 and
      cast to bfloat16 exactly like the reference (ref:module.py:768,
      UMGen.py:137)
    * bbox3d_spatial_posi [1030, d] — x/y spatial PE, start_index=1024
      (ref:UMGen.py:138)
    * grid_center_pe [1024, d] — per-map-cell PE from digitized cell centers
      (ref:UMGen.py:143-153)
    * map/img codebooks [8192, 16] (ref:UMGen.py:247-255) — random when no
      weight file is given (debug mode)
    * ego/agent decode tables for the in-graph pose/bbox decode
    """
    d = config.n_embd
    rng = rng or np.random.default_rng(0)
    pipeline = pipeline or ScenePipeline()

    fouier = nn.position_encoding_init(1024, d, dtype=np.float32)
    spatial = nn.position_encoding_init(1030, d, start_index=1024,
                                        dtype=np.float32)
    # cast through bf16 to match checkpoint tables (ref:module.py:768)
    fouier = fouier.astype(jnp.bfloat16).astype(np.float32)
    spatial_bf16 = spatial.astype(jnp.bfloat16).astype(np.float32)

    # grid-center PE (ref:UMGen.py:140-153): 32x32 cell centers at 4 m/cell,
    # negated, normalized to [0,1], digitized into the 1024-bin table
    gh, gw = MAP_HW
    cell = 128.0 / gh
    gi, gj = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    cx = -((gi + 0.5) * cell - 64.0)
    cy = -((gj + 0.5) * cell - 64.0)
    centers = np.stack([cx, cy], axis=-1)
    norm = (centers + 64.0) / 128.0
    bins = np.linspace(0.0, 1.0, 1024)
    tok = np.digitize(norm, bins)
    grid_pe = (spatial_bf16[tok[..., 0].reshape(-1)]
               + spatial_bf16[tok[..., 1].reshape(-1)])

    if map_codebook is None:
        map_codebook = rng.normal(0, 1, (config.map_vocab_size,
                                         config.n_map_embd))
    if img_codebook is None:
        img_codebook = rng.normal(0, 1, (config.img_vocab_size,
                                         config.n_img_embd))

    consts = pipeline.device_constants()
    dt = _dt(config)
    return {
        "fouier_pe": jnp.asarray(fouier, dt),
        "bbox_spatial_pe": jnp.asarray(spatial_bf16, dt),
        "grid_center_pe": jnp.asarray(grid_pe, dt),
        "map_codebook": jnp.asarray(map_codebook, dt),
        "img_codebook": jnp.asarray(img_codebook, dt),
        "ego_bin_mid": jnp.asarray(consts["ego_bin_midpoints"], jnp.float32),
        "ego_mean": jnp.asarray(consts["ego_mean"], jnp.float32),
        "ego_std": jnp.asarray(consts["ego_std"], jnp.float32),
        "agent_bin_mid": jnp.asarray(consts["agent_bin_midpoints"],
                                     jnp.float32),
        "agent_lo": jnp.asarray(consts["agent_lo"], jnp.float32),
        "agent_span": jnp.asarray(consts["agent_span"], jnp.float32),
    }


class UMGen:
    """Stateless model wrapper: config + layout + pure apply functions."""

    def __init__(self, config: ModelConfig,
                 attn_impl: Optional[Callable] = None):
        self.config = config
        self.layout = SequenceLayout(config.task)
        if attn_impl is None and config.use_pallas_attention:
            from umgen_tpu.ops.attention import best_attn_impl
            attn_impl = best_attn_impl()
        self.attn = attn_impl or nn.sdpa

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array,
                    buffers: Optional[Params] = None) -> Params:
        cfg = self.config
        d, dt = cfg.n_embd, _dt(cfg)
        keys = iter(jax.random.split(key, 64))
        nk = lambda: next(keys)

        def emb(n):
            return nn._normal(nk(), (n, d), dt)

        params: Params = {
            # learned embeddings (ref:UMGen.py:176-184)
            "egoe": emb(3),
            "axe": emb(cfg.aux_vocab_size),
            "be": emb(cfg.bbox3d_vocab_size),
            "tpe": emb(cfg.max_frame_len),
            # relative temporal-PE: per-head logit bias by query-key frame
            # distance (temporal_pe_mode="relative"; zeros init — the
            # bias starts neutral and training shapes the temporal
            # kernel).  Always present so checkpoints can switch modes;
            # absolute mode never reads it (and the importer never
            # writes it — the torch reference has no such table).
            "tpe_rel": jnp.zeros((cfg.n_head, cfg.max_frame_len),
                                 jnp.float32),
            "spe": emb(self.layout.seq_len),
            "tske": emb(7),
            # codebook-dim → d projections (ref:UMGen.py:215,235)
            "map_mlp_pre": nn.init_mlp(nk(), cfg.n_map_embd, False, dt,
                                       d_hidden=4 * d, d_out=d),
            # stacks
            "tar": nn.init_stack(nk(), cfg.n_tar_layer, nn.init_block_tar,
                                 d, cfg.bias, dt),
            "ln_tar": nn.init_layernorm(d, dt),
            "oar": nn.init_stack(nk(), cfg.n_oar_layer, nn.init_block_oar,
                                 d, cfg.bias, dt),
            "ln_oar": nn.init_layernorm(d, dt),
            "ego_tar": nn.init_stack(nk(), cfg.n_ego_tar_layer,
                                     nn.init_block_tar, d, cfg.bias, dt),
            "ln_ego_tar": nn.init_layernorm(d, dt),
            "ego_ca": nn.init_stack(nk(), cfg.n_ego_ca_layer,
                                    nn.init_decoder_block, d, cfg.bias, dt),
            "ln_ego": nn.init_layernorm(d, dt),
            # heads (no bias, ref:UMGen.py:199-211)
            "head_tar_aux": nn.init_linear(nk(), d, cfg.aux_vocab_size,
                                           False, dt),
            "head_tar_pose": nn.init_linear(nk(), d, cfg.pose_vocab_size,
                                            False, dt),
            "head_tar_map": nn.init_linear(nk(), d, cfg.map_vocab_size,
                                           False, dt),
            # n_step > 1 replaces this with the widened n-step head below
            # (ref:UMGen.py:221-226)
            "head_tar_bbox3d": nn.init_linear(nk(), d, cfg.bbox3d_vocab_size,
                                              False, dt),
            "head_ar_aux": nn.init_linear(nk(), d, cfg.aux_vocab_size,
                                          False, dt),
            "head_ar_pose": nn.init_linear(nk(), d, cfg.pose_vocab_size,
                                           False, dt),
            "head_ar_map": nn.init_linear(nk(), d, cfg.map_vocab_size,
                                          False, dt),
            "head_ar_bbox3d": nn.init_linear(nk(), d, cfg.bbox3d_vocab_size,
                                             False, dt),
            "head_ego": nn.init_linear(nk(), d, cfg.pose_vocab_size,
                                       False, dt),
        }
        if cfg.n_step > 1:
            # multi-step TAR bbox head: n_step vocab slices side by side
            # (ref:UMGen.py:224-226); replaces head_tar_bbox3d
            del params["head_tar_bbox3d"]
            params["head_tar_n_step_bbox3d"] = nn.init_linear(
                nk(), d, cfg.bbox3d_vocab_size * cfg.n_step, False, dt)
        if cfg.split_map_tar:
            params["map_tar"] = nn.init_stack(nk(), cfg.n_map_tar_layer,
                                              nn.init_block_tar, d, cfg.bias,
                                              dt)
            params["ln_map_tar"] = nn.init_layernorm(d, dt)
        if cfg.sample_img:
            params["head_tar_img"] = nn.init_linear(nk(), d,
                                                    cfg.img_vocab_size,
                                                    False, dt)
            params["head_ar_img"] = nn.init_linear(nk(), d,
                                                   cfg.img_vocab_size,
                                                   False, dt)
            params["img_mlp_pre"] = nn.init_mlp(nk(), cfg.n_img_embd, False,
                                                dt, d_hidden=4 * d, d_out=d)
        if cfg.split_box_tar and "bbox3d" in self.layout.mod_order:
            # gated by the split flag alone in the reference
            # (ref:UMGen.py:237-239); the bbox refinement TAR exists for
            # every bbox-bearing task, not only the image task
            params["box_tar"] = nn.init_stack(nk(), cfg.n_box_tar_layer,
                                              nn.init_block_tar, d,
                                              cfg.bias, dt)
            params["ln_box_tar"] = nn.init_layernorm(d, dt)
        params["buffers"] = buffers if buffers is not None else \
            build_buffers(cfg)
        return params

    def param_count(self, params: Params) -> int:
        leaves = jax.tree.leaves(
            {k: v for k, v in params.items() if k != "buffers"})
        return sum(int(np.prod(l.shape)) for l in leaves)

    # ------------------------------------------------------------------
    # embeddings (ref:UMGen.py:438-528)
    # ------------------------------------------------------------------
    def embed_pose(self, params, tokens):
        return params["buffers"]["fouier_pe"][tokens]

    def embed_map(self, params, tokens, grid_pe: bool):
        z = params["buffers"]["map_codebook"][tokens]
        feats = nn.mlp(params["map_mlp_pre"], z)
        if grid_pe:
            feats = feats + params["buffers"]["grid_center_pe"]
        return feats

    def embed_image(self, params, tokens):
        z = params["buffers"]["img_codebook"][tokens]
        return nn.mlp(params["img_mlp_pre"], z)

    def embed_bbox(self, params, tokens, spatial_pe: bool):
        """tokens [..., 660]; spatial PE adds per-object x/y table entries
        broadcast over the 11 attribute tokens (ref:UMGen.py:411-435)."""
        feats = params["be"][tokens]
        if spatial_pe:
            shape = tokens.shape[:-1]
            boxes = tokens.reshape(*shape, self.config.pad_to_length, 11)
            pe_tab = params["buffers"]["bbox_spatial_pe"]
            pe = pe_tab[boxes[..., 0]] + pe_tab[boxes[..., 1]]
            pe = jnp.repeat(pe[..., None, :], 11, axis=-2)
            feats = feats + pe.reshape(*shape, -1, feats.shape[-1])
        return feats

    def add_bos_eos(self, params, feats, mod):
        """Wrap [B, T, S, D] content with BOS/EOS aux embeddings
        (ref:UMGen.py:470-481)."""
        from umgen_tpu.config import BOS_EOS
        bos, eos = BOS_EOS[mod]
        B, T = feats.shape[:2]
        axe = params["axe"]
        bos_e = jnp.broadcast_to(axe[bos], (B, T, 1, feats.shape[-1]))
        eos_e = jnp.broadcast_to(axe[eos], (B, T, 1, feats.shape[-1]))
        return jnp.concatenate([bos_e, feats, eos_e], axis=2)

    def add_pos_emb(self, params, x, t_offset: int = 0):
        """+ sequence PE + temporal PE (ref:UMGen.py:483-515).

        t_offset shifts the temporal-PE index (used by the temporal-cache
        fast path where absolute frame ids grow without bound).

        Index saturation, NOT wraparound: the reference re-embeds the slid
        window every frame (ref:UMGen.py:1600-1603), so no frame ever
        indexes a ``tpe`` row beyond its window and rows past the trained
        window stay untrained for ANY checkpoint.  The cached path cannot
        re-embed history, so deep rollouts would index those untrained
        rows (measured: speculative acceptance collapses 1.41 -> 0.23
        past the trained window, PERFORMANCE.md "speculative acceptance").
        Clamping reproduces the reference's steady state — the newest
        frame of a full window holds the LAST trained slot — instead of
        the old ``% max_frame_len`` wrap, which re-used slot 0 for frame
        ``max_frame_len`` (a semantic lie on both counts).
        ``config.tpe_clamp`` tightens the clamp to a checkpoint's actual
        trained window (bench/serving wire it from checkpoint metadata).
        """
        B, T, S, D = x.shape
        spe = params["spe"][:S][None, None]
        if self.config.temporal_pe_mode == "relative":
            # relative mode: temporal position enters ONLY at the
            # temporal-attention logits (tpe_rel bias) — embeddings and
            # cached K/V stay PE-free, so deep cached frames are
            # distributionally identical to window-anchored ones
            return x + spe
        clamp = self.config.tpe_clamp
        if clamp is None:
            clamp = self.config.max_frame_len - 1
        tpe_idx = jnp.minimum(jnp.arange(T) + t_offset, clamp)
        tpe = params["tpe"][tpe_idx][None, :, None, :]
        return x + spe + tpe

    # ------------------------------------------------------------------
    # relative temporal-PE bias builders (temporal_pe_mode="relative")
    # ------------------------------------------------------------------
    def _rel_clamp(self) -> int:
        c = self.config.tpe_clamp
        return self.config.max_frame_len - 1 if c is None else c

    def _t_bias_window(self, params, T: int):
        """[H, T, T] temporal-logit bias for full-window attention
        (bias[h, t, s] = tpe_rel[h, t - s], distance clamped to the
        trained range), or None in absolute mode."""
        if self.config.temporal_pe_mode != "relative":
            return None
        rel = jnp.clip(jnp.arange(T)[:, None] - jnp.arange(T)[None, :],
                       0, self._rel_clamp())
        return params["tpe_rel"][:, rel]

    def _t_bias_ring(self, params, slot, T_max: int):
        """([H, T_max] per-ring-slot bias, [H] self bias) for the cached
        one-frame path.  Slot j holds the frame `(slot - j) % T_max`
        frames ago; the query's own frame is the separate self term at
        distance 0.  Returns (None, None) in absolute mode."""
        if self.config.temporal_pe_mode != "relative":
            return None, None
        ages = jnp.mod(slot - jnp.arange(T_max), T_max)
        ages = jnp.minimum(ages, self._rel_clamp())
        return params["tpe_rel"][:, ages], params["tpe_rel"][:, 0]

    # ------------------------------------------------------------------
    # pose decode, in-graph (ref:UMGen.py:1008-1024)
    # ------------------------------------------------------------------
    def decode_pose(self, params, pose_tokens):
        """pose tokens [..., 3] → metric (dx, dy, dtheta) float32."""
        b = params["buffers"]
        mids = b["ego_bin_mid"][jnp.clip(pose_tokens, 0, 1023)]
        return mids * b["ego_std"] + b["ego_mean"]

    # ------------------------------------------------------------------
    # TAR input assembly
    # ------------------------------------------------------------------
    def _tar_input(self, params, inputs, mods, *, map_grid_pe: bool,
                   pose_diff, t_offset: int = 0,
                   warp: bool = True) -> Tuple[jnp.ndarray,
                                               Optional[jnp.ndarray]]:
        """Embed + warp + wrap + concat a TAR input sequence.

        Returns (emb [B, T, sum(seg_len), D], map_warped or None).
        map_warped is the warped content-only map embedding (prior for OAR,
        ref:UMGen.py:728-736).
        """
        cfg = self.config
        segs = []
        map_warped = None
        for mod in mods:
            if mod == "pose":
                feats = self.embed_pose(params, inputs["pose"])
            elif mod == "map":
                feats = self.embed_map(params, inputs["map"],
                                       grid_pe=map_grid_pe)
                if cfg.map_transform and warp:
                    map_warped = affine_warp_map(feats, pose_diff)
                    feats = map_warped + feats
            elif mod == "bbox3d":
                feats = self.embed_bbox(params, inputs["bbox3d"],
                                        spatial_pe=cfg.add_posi_embedd)
            elif mod == "image":
                feats = self.embed_image(params, inputs["image"])
            else:
                raise ValueError(mod)
            segs.append(self.add_bos_eos(params, feats, mod))
        emb = jnp.concatenate(segs, axis=2)
        return self.add_pos_emb(params, emb, t_offset=t_offset), map_warped

    def _run_tar_stack(self, params, stack_name, ln_name, emb):
        cfg = self.config
        t_bias = self._t_bias_window(params, emb.shape[1])
        block = functools.partial(nn.block_tar, n_head=cfg.n_head,
                                  attn_impl=self.attn, t_bias=t_bias)
        out = nn.apply_stack(params[stack_name], emb,
                             lambda p, h: block(p, h), remat=cfg.remat)
        return nn.layer_norm(params[ln_name], out)

    # ------------------------------------------------------------------
    # ego network (ref:UMGen.py:634-687, 994-1005)
    #
    # NB the reference's forward_ego_net embeds WITHOUT the map warp and
    # WITHOUT the grid-center map PE (it calls get_mod_emb_pre with only
    # add_posi_embedd, ref:UMGen.py:656-661) — the ego net sees the raw
    # un-warped window.
    # ------------------------------------------------------------------
    def forward_ego_net(self, params, inputs) -> jnp.ndarray:
        cfg = self.config
        emb, _ = self._tar_input(params, inputs, self.layout.mod_order,
                                 map_grid_pe=False, pose_diff=None,
                                 warp=False)
        tar_emb = self._run_tar_stack(params, "ego_tar", "ln_ego_tar", emb)
        B, T, S, D = tar_emb.shape
        return self._ego_queries(params, tar_emb.reshape(B * T, S, D),
                                 B, T, t_offset=0)

    def _ego_queries(self, params, ctx, B, T, t_offset) -> jnp.ndarray:
        """3 learned ego queries cross-attend each frame's scene embedding
        (ref:UMGen.py:671-687).  ctx: [B*T, S, D] → [B, T, 3, D]."""
        cfg = self.config
        D = ctx.shape[-1]
        ego = jnp.broadcast_to(params["egoe"][None, None], (B, T, 3, D))
        ego = self.add_pos_emb(params, ego, t_offset=t_offset)
        q = ego.reshape(B * T, 3, D)
        dec = functools.partial(nn.decoder_block, n_head=cfg.n_head)
        q = nn.apply_stack(params["ego_ca"], q, lambda p, h: dec(p, h, ctx),
                           remat=cfg.remat)
        q = nn.layer_norm(params["ln_ego"], q)
        return q.reshape(B, T, 3, D)

    def ego_logits(self, params, inputs) -> jnp.ndarray:
        """Last-frame ego logits [B, 3, pose_vocab] (ref:UMGen.py:994-1005)."""
        ego_emb = self.forward_ego_net(params, inputs)
        return nn.linear(params["head_ego"], ego_emb[:, -1])

    # ------------------------------------------------------------------
    # TAR cascade → last-frame OAR prior (ref:UMGen.py:1479-1511)
    # ------------------------------------------------------------------
    def tar_cascade(self, params, inputs) -> Dict[str, jnp.ndarray]:
        """Run the full TAR cascade over the window.

        inputs: token dict over the T-frame window WITH the pose stream
        already shifted (ego action for the frame being generated at slot
        T-1, ref:UMGen.py:1444-1452).

        Returns dict with:
          tar_emb     {mod: [B, T, seg_len, D]} — per-frame TAR embeddings
                      with the split-TAR overrides and the warped-map
                      residual applied
          pose_diff   [B, T, 3] metric ego motion
        """
        cfg = self.config
        lo = self.layout
        pose_diff = self.decode_pose(params, inputs["pose"])

        # trunk TAR over all modalities (map WITH grid PE)
        emb, _ = self._tar_input(params, inputs, lo.mod_order,
                                 map_grid_pe=cfg.add_spatial_pos_embedd_on_map,
                                 pose_diff=pose_diff)
        trunk = self._run_tar_stack(params, "tar", "ln_tar", emb)

        # split per-modality segments
        seg_lens = [s.end - s.start + 1 for s in lo.segments]
        offs = np.cumsum([0] + seg_lens)
        tar_emb = {
            s.mod: jax.lax.slice_in_dim(trunk, int(offs[i]), int(offs[i + 1]),
                                        axis=2)
            for i, s in enumerate(lo.segments)
        }

        map_warped_prior = None
        if cfg.split_map_tar and "map" in lo.mod_order:
            emb_m, warped_m = self._tar_input(
                params, inputs, TASKS["pose_map"], map_grid_pe=False,
                pose_diff=pose_diff)
            out_m = self._run_tar_stack(params, "map_tar", "ln_map_tar",
                                        emb_m)
            tar_emb["map"] = out_m[:, :, 5:, :]      # pose seg is 5 long
            # OAR warped-map prior comes from the map-TAR pass when grid PE
            # is on (ref:UMGen.py:1502-1507)
            map_warped_prior = warped_m

        if cfg.split_box_tar and "bbox3d" in lo.mod_order:
            emb_b, warped_b = self._tar_input(
                params, inputs, TASKS["pose_map_bbox3d"], map_grid_pe=False,
                pose_diff=pose_diff)
            out_b = self._run_tar_stack(params, "box_tar", "ln_box_tar",
                                        emb_b)
            tar_emb["bbox3d"] = out_b[:, :, 5 + 1026:, :]
            if not cfg.split_map_tar:
                tar_emb["map"] = out_b[:, :, 5:5 + 1026, :]
                map_warped_prior = warped_b

        # add warped map residual to the map prior content positions
        # (ref:UMGen.py:1508-1511)
        if cfg.map_transform and "map" in lo.mod_order \
                and map_warped_prior is not None:
            m = tar_emb["map"]
            content = m[:, :, 1:-1, :] + map_warped_prior
            tar_emb["map"] = jnp.concatenate(
                [m[:, :, :1, :], content, m[:, :, -1:, :]], axis=2)

        return {"tar_emb": tar_emb, "pose_diff": pose_diff}

    def tar_priors(self, params, inputs) -> Dict[str, jnp.ndarray]:
        """Last-frame OAR additive prior (inference path):
        prior_seq [B, seq_len, D] = concat over modality segments of the
        final frame's TAR embeddings (ref:UMGen.py:1227-1231)."""
        out = self.tar_cascade(params, inputs)
        prior_seq = jnp.concatenate(
            [out["tar_emb"][s.mod][:, -1] for s in self.layout.segments],
            axis=1)
        return {"prior_seq": prior_seq, "pose_diff": out["pose_diff"]}

    # ------------------------------------------------------------------
    # temporal-cache fast path (tar_mode="temporal_cache")
    #
    # The reference recomputes every TAR stack over the full 20-frame
    # window each frame (SURVEY §7 hard-part 5: `kvcache_t` is always None,
    # ref:UMGen.py:666,767) — ~145 TFLOP/frame at the larger scale.  TAR
    # computation is frame-causal, so caching each layer's temporal-
    # attention K/V in a T_max ring lets each new frame push only its own
    # 2207 tokens through the cascade (~12 TFLOP/frame).  Semantics:
    # identical to recompute while the window is still growing; after the
    # window slides, cached K/V retain their historical context
    # (StreamingLLM-style sliding window) and temporal PEs roll by absolute
    # frame index — a documented divergence of the fast path.
    # ------------------------------------------------------------------
    def _stack_names(self):
        cfg, lo = self.config, self.layout
        names = [("tar", "ln_tar", self.layout.seq_len),
                 ("ego_tar", "ln_ego_tar", self.layout.seq_len)]
        if cfg.split_map_tar and "map" in lo.mod_order:
            names.append(("map_tar", "ln_map_tar", 5 + 1026))
        if cfg.split_box_tar and "bbox3d" in lo.mod_order:
            names.append(("box_tar", "ln_box_tar", 5 + 1026 + 662))
        return names

    @property
    def t_max(self) -> int:
        """TAR temporal-ring length (config.tar_cache_window, default the
        20-frame conditioning window)."""
        return self.config.tar_cache_window or self.config.cond_frame

    @property
    def _ring_q4(self) -> bool:
        """int4 rings: nibble-packed int8 storage + per-(L, B, T, H) scales.
        Halves ring HBM vs fp8/int8 — the rings are what cap the scene
        batch on one chip (PERFORMANCE.md) — at a per-frame-per-head
        quantization granularity."""
        return self.config.tar_cache_dtype == "int4"

    @property
    def _ring_q2(self) -> bool:
        """int2 rings (sub-int4, VERDICT r4 "unvisited" lever): 2-bit-packed
        int8 storage + per-(L, B, T, H) scales + STATIC per-(L, B, H, Dh)
        channel equalizers frozen at prefill.  Halves ring HBM again vs
        int4 — 1.32 GB/scene at win-20 vs int4's 2.63 — which is what
        admits B >= 8 at the full 20-frame window on one v5e chip."""
        return self.config.tar_cache_dtype == "int2"

    def init_tar_cache(self, B: int) -> Dict[str, Any]:
        cfg = self.config
        T_max = self.t_max
        cache: Dict[str, Any] = {"frames": jnp.zeros((), jnp.int32)}
        layer_count = {"tar": cfg.n_tar_layer, "ego_tar": cfg.n_ego_tar_layer,
                       "map_tar": cfg.n_map_tar_layer,
                       "box_tar": cfg.n_box_tar_layer}
        for name, _, S in self._stack_names():
            L = layer_count[name]
            if self._ring_q2:
                shape = (L, B * S, T_max, cfg.n_head, cfg.head_dim // 4)
                sshape = (L, B, T_max, cfg.n_head)
                cshape = (L, B, cfg.n_head, cfg.head_dim)
                cache[name] = (jnp.zeros(shape, jnp.int8),
                               jnp.zeros(shape, jnp.int8),
                               jnp.zeros(sshape, jnp.float32),
                               jnp.zeros(sshape, jnp.float32),
                               jnp.ones(cshape, jnp.float32),
                               jnp.ones(cshape, jnp.float32))
            elif self._ring_q4:
                shape = (L, B * S, T_max, cfg.n_head, cfg.head_dim // 2)
                sshape = (L, B, T_max, cfg.n_head)
                cache[name] = (jnp.zeros(shape, jnp.int8),
                               jnp.zeros(shape, jnp.int8),
                               jnp.zeros(sshape, jnp.float32),
                               jnp.zeros(sshape, jnp.float32))
            else:
                dt = jnp.dtype(cfg.tar_cache_dtype)
                shape = (L, B * S, T_max, cfg.n_head, cfg.head_dim)
                cache[name] = (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        return cache

    def tar_cache_pspecs(self, axis: str = "dp"):
        """PartitionSpec pytree matching init_tar_cache's structure, for
        shard_map'd serving: rings shard their scene-major dim over `axis`
        (dim 1 of [L, B*S, T, H, Dh] is B-major, so a split along it is a
        scene split), the frame counter is replicated.  Kept adjacent to
        init_tar_cache — the two must evolve together."""
        from jax.sharding import PartitionSpec as P
        cache: Dict[str, Any] = {"frames": P()}
        ring = P(None, axis, None, None, None)
        for name, _, _ in self._stack_names():
            if self._ring_q2:
                s = P(None, axis, None, None)
                cache[name] = (ring, ring, s, s, s, s)
            elif self._ring_q4:
                cache[name] = (ring, ring, P(None, axis, None, None),
                               P(None, axis, None, None))
            else:
                cache[name] = (ring, ring)
        return cache

    @staticmethod
    def _ring_q4_quantize(x: jnp.ndarray, B: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [L, N, H, Dh] new K or V rows (N = B·S) → (packed
        [L, N, H, Dh//2] int8, dequant scales [L, B, H] f32).  Scales are
        amax over this frame's positions and head dims per (layer, scene,
        head)."""
        L, N, H, Dh = x.shape
        xf = x.astype(jnp.float32).reshape(L, B, N // B, H, Dh)
        amax = jnp.max(jnp.abs(xf), axis=(2, 4))
        s = jnp.maximum(amax, 1e-6) * (1.0 / 7.0)
        q = jnp.clip(jnp.round(xf / s[:, :, None, :, None]), -7, 7)
        q = q.astype(jnp.int8).reshape(L, N, H, Dh)
        return nn.q4_pack(q), s

    @staticmethod
    def _ring_q4_quantize_layer(x: jnp.ndarray, B: int
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-layer variant of `_ring_q4_quantize` (x: [N, H, Dh] →
        packed [N, H, Dh//2] int8, scales [B, H] f32).  Scales are
        per-(layer, scene, head) in both variants, so quantizing inside
        the layer scan is bit-identical to quantizing the stacked
        [L, ...] collect — but the bf16 collect never materializes
        (2 × [36, B·S, H, Dh] bf16 = 3.6 GB at B=16 was the peak HBM
        temp that OOMed the B=12/16 serving configs, r3a stages 7-9)."""
        N, H, Dh = x.shape
        xf = x.astype(jnp.float32).reshape(B, N // B, H, Dh)
        amax = jnp.max(jnp.abs(xf), axis=(1, 3))
        s = jnp.maximum(amax, 1e-6) * (1.0 / 7.0)
        q = jnp.clip(jnp.round(xf / s[:, None, :, None]), -7, 7)
        return nn.q4_pack(q.astype(jnp.int8).reshape(N, H, Dh)), s

    @staticmethod
    def _ring_q2_quantize_layer(x: jnp.ndarray, B: int, chan: jnp.ndarray
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """int2 counterpart of `_ring_q2_quantize` for one new frame.
        x: [N, H, Dh], chan: [B, H, Dh] frozen equalizer → (packed
        [N, H, Dh//4] int8, scales [B, H] f32).  Levels are the symmetric
        half-offset grid {-1.5, -0.5, 0.5, 1.5}·s·chan: q = clip(round(
        x/(chan·s) - 0.5), -2, 1), dequant (q + 0.5)·s·chan.  The frame
        scale s adapts per (scene, head) every write, so a stale equalizer
        only mis-shapes relative channel weighting, never the range."""
        N, H, Dh = x.shape
        xf = x.astype(jnp.float32).reshape(B, N // B, H, Dh) / chan[:, None]
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 3)), 1e-6) * (1 / 1.5)
        q = jnp.clip(jnp.round(xf / s[:, None, :, None] - 0.5), -2, 1)
        return nn.q2_pack(q.astype(jnp.int8).reshape(N, H, Dh)), s

    def _run_tar_stack_cached(self, params, stack_name, ln_name, x, kv,
                              slot, n_valid):
        """x: [B, S, D] new frame → ([B, S, D], updated kv).

        Rings are READ-ONLY inside the layer scan (scan ys cannot alias xs,
        so in-scan ring updates would materialize fresh multi-GB copies);
        all layers' new K/V scatter into the rings with one
        dynamic_update_slice at the frame's ring slot."""
        cfg = self.config
        B = x.shape[0]
        tb_ring, tb_self = self._t_bias_ring(params, slot,
                                             kv[0].shape[2])

        if self._ring_q2:
            kv_k, kv_v, sk, sv, ck, cv = kv

            def body_q2(h, layer):
                p, k_l, v_l, sk_l, sv_l, ck_l, cv_l = layer
                h, k_new, v_new = nn.block_tar_decode_deferred(
                    p, h, cfg.n_head, k_l, v_l, slot, n_valid,
                    attn_impl=self.attn, ring_scale_k=sk_l,
                    ring_scale_v=sv_l, t_bias_ring=tb_ring,
                    t_bias_self=tb_self, ring_chan_k=ck_l,
                    ring_chan_v=cv_l, ring_bits=2)
                return h, (self._ring_q2_quantize_layer(k_new, B, ck_l)
                           + self._ring_q2_quantize_layer(v_new, B, cv_l))

            h, (kp, s_k, vp, s_v) = jax.lax.scan(
                body_q2, x, (params[stack_name], kv_k, kv_v, sk, sv,
                             ck, cv))
            kv_k = jax.lax.dynamic_update_slice(
                kv_k, kp[:, :, None], (0, 0, slot, 0, 0))
            kv_v = jax.lax.dynamic_update_slice(
                kv_v, vp[:, :, None], (0, 0, slot, 0, 0))
            sk = jax.lax.dynamic_update_slice(
                sk, s_k[:, :, None], (0, 0, slot, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, s_v[:, :, None], (0, 0, slot, 0))
            return (nn.layer_norm(params[ln_name], h),
                    (kv_k, kv_v, sk, sv, ck, cv))

        if self._ring_q4:
            kv_k, kv_v, sk, sv = kv

            def body_q4(h, layer):
                p, k_l, v_l, sk_l, sv_l = layer
                h, k_new, v_new = nn.block_tar_decode_deferred(
                    p, h, cfg.n_head, k_l, v_l, slot, n_valid,
                    attn_impl=self.attn, ring_scale_k=sk_l,
                    ring_scale_v=sv_l, t_bias_ring=tb_ring,
                    t_bias_self=tb_self)
                # quantize per layer inside the scan (bit-identical:
                # scales are per-(layer, scene, head) either way) so the
                # collect ys are int4-packed, not bf16 — the bf16
                # [L, B·S, H, Dh] pair was the peak HBM temp at B >= 12
                return h, (self._ring_q4_quantize_layer(k_new, B)
                           + self._ring_q4_quantize_layer(v_new, B))

            h, (kp, s_k, vp, s_v) = jax.lax.scan(
                body_q4, x, (params[stack_name], kv_k, kv_v, sk, sv))
            kv_k = jax.lax.dynamic_update_slice(
                kv_k, kp[:, :, None], (0, 0, slot, 0, 0))
            kv_v = jax.lax.dynamic_update_slice(
                kv_v, vp[:, :, None], (0, 0, slot, 0, 0))
            sk = jax.lax.dynamic_update_slice(
                sk, s_k[:, :, None], (0, 0, slot, 0))
            sv = jax.lax.dynamic_update_slice(
                sv, s_v[:, :, None], (0, 0, slot, 0))
            return nn.layer_norm(params[ln_name], h), (kv_k, kv_v, sk, sv)

        kv_k, kv_v = kv

        def body(h, layer):
            p, k_l, v_l = layer
            h, k_new, v_new = nn.block_tar_decode_deferred(
                p, h, cfg.n_head, k_l, v_l, slot, n_valid,
                attn_impl=self.attn, t_bias_ring=tb_ring,
                t_bias_self=tb_self)
            # cast to the ring dtype in-scan (halves the collect temps
            # for fp8/int8 rings; no-op for bf16)
            return h, (k_new.astype(kv_k.dtype), v_new.astype(kv_v.dtype))

        h, (ks, vs) = jax.lax.scan(body, x, (params[stack_name], kv_k,
                                             kv_v))
        kv_k = jax.lax.dynamic_update_slice(
            kv_k, ks[:, :, None], (0, 0, slot, 0, 0))
        kv_v = jax.lax.dynamic_update_slice(
            kv_v, vs[:, :, None], (0, 0, slot, 0, 0))
        return nn.layer_norm(params[ln_name], h), (kv_k, kv_v)

    def _run_tar_stack_prefill(self, params, stack_name, ln_name, emb,
                               T_max):
        """Full-window pass that also fills the temporal ring.
        emb: [B, T, S, D] → ([B, T, S, D], kv rings [L, B*S, T_max, H, Dh]).

        When the window is longer than the ring, only the last T_max
        frames' K/V are kept, scattered at their absolute ring slots so
        subsequent writes overwrite the oldest frame."""
        cfg = self.config
        B = emb.shape[0]
        T = emb.shape[1]
        keep = min(T, T_max)
        slots = np.arange(T - keep, T) % T_max     # static permutation
        t_bias = self._t_bias_window(params, T)

        if self._ring_q2:
            def body_q2(h, p):
                h, (k, v) = nn.block_tar_collect_kv(p, h, cfg.n_head,
                                                    attn_impl=self.attn,
                                                    t_bias=t_bias)

                def ring(a):          # a: [N, T, H, Dh]
                    N, _, H, Dh = a.shape
                    af = a.astype(jnp.float32).reshape(B, N // B, T, H, Dh)
                    # frozen channel equalizer from the window statistics
                    c = jnp.maximum(jnp.max(jnp.abs(af), axis=(1, 2)),
                                    1e-6)                       # [B, H, Dh]
                    ae = af / c[:, None, None]
                    amax = jnp.max(jnp.abs(ae), axis=(1, 4))    # [B, T, H]
                    s = jnp.maximum(amax, 1e-6) * (1.0 / 1.5)
                    q = jnp.clip(jnp.round(ae / s[:, None, :, :, None]
                                           - 0.5), -2, 1).astype(jnp.int8)
                    packed = nn.q2_pack(q.reshape(N, T, H, Dh))
                    r = jnp.zeros((N, T_max, H, Dh // 4), jnp.int8)
                    r = r.at[:, slots].set(packed[:, -keep:])
                    rs = jnp.zeros((B, T_max, H), jnp.float32)
                    rs = rs.at[:, slots].set(s[:, -keep:])
                    return r, rs, c

                rk, rsk, rck = ring(k)
                rv, rsv, rcv = ring(v)
                return h, (rk, rv, rsk, rsv, rck, rcv)

            h, kv = jax.lax.scan(body_q2, emb, params[stack_name])
            return nn.layer_norm(params[ln_name], h), kv

        if self._ring_q4:
            def body_q4(h, p):
                h, (k, v) = nn.block_tar_collect_kv(p, h, cfg.n_head,
                                                    attn_impl=self.attn,
                                                    t_bias=t_bias)

                def ring(a):          # a: [N, T, H, Dh]
                    N, _, H, Dh = a.shape
                    af = a.astype(jnp.float32).reshape(B, N // B, T, H, Dh)
                    amax = jnp.max(jnp.abs(af), axis=(1, 4))   # [B, T, H]
                    s = jnp.maximum(amax, 1e-6) * (1.0 / 7.0)
                    q = jnp.clip(jnp.round(af / s[:, None, :, :, None]),
                                 -7, 7).astype(jnp.int8)
                    packed = nn.q4_pack(q.reshape(N, T, H, Dh))
                    r = jnp.zeros((N, T_max, H, Dh // 2), jnp.int8)
                    r = r.at[:, slots].set(packed[:, -keep:])
                    rs = jnp.zeros((B, T_max, H), jnp.float32)
                    rs = rs.at[:, slots].set(s[:, -keep:])
                    return r, rs

                rk, rsk = ring(k)
                rv, rsv = ring(v)
                return h, (rk, rv, rsk, rsv)

            h, kv = jax.lax.scan(body_q4, emb, params[stack_name])
            return nn.layer_norm(params[ln_name], h), kv

        cache_dt = jnp.dtype(cfg.tar_cache_dtype)

        def body(h, p):
            h, (k, v) = nn.block_tar_collect_kv(p, h, cfg.n_head,
                                                attn_impl=self.attn,
                                                t_bias=t_bias)

            def ring(a):
                r = jnp.zeros(a.shape[:1] + (T_max,) + a.shape[2:],
                              cache_dt)
                return r.at[:, slots].set(a[:, -keep:].astype(cache_dt))

            return h, (ring(k), ring(v))

        h, kv = jax.lax.scan(body, emb, params[stack_name])
        return nn.layer_norm(params[ln_name], h), kv

    def tar_priors_cached(self, params, frame_inputs, cache,
                          abs_frame) -> Dict[str, Any]:
        """One-frame TAR cascade against the rings.

        frame_inputs: {mod: [B, 1, len]} — the newest frame with the pose
        slot holding the CURRENT action (shifted semantics).
        abs_frame: int32 absolute index of this frame in the stream.
        Returns {"prior_seq", "pose_diff", "cache"}.
        """
        cfg, lo = self.config, self.layout
        T_max = self.t_max
        slot = jnp.asarray(abs_frame % T_max, jnp.int32)
        n_valid = jnp.minimum(abs_frame + 1, T_max).astype(jnp.int32)
        pose_diff = self.decode_pose(params, frame_inputs["pose"])
        new_cache = dict(cache)

        def frame_emb(mods, grid_pe):
            emb, warped = self._tar_input(
                params, frame_inputs, mods, map_grid_pe=grid_pe,
                pose_diff=pose_diff, t_offset=abs_frame)
            return emb[:, 0], warped        # [B, S, D]

        emb, _ = frame_emb(lo.mod_order,
                           cfg.add_spatial_pos_embedd_on_map)
        trunk, new_cache["tar"] = self._run_tar_stack_cached(
            params, "tar", "ln_tar", emb, cache["tar"], slot, n_valid)

        seg_lens = [s.end - s.start + 1 for s in lo.segments]
        offs = np.cumsum([0] + seg_lens)
        tar_emb = {
            s.mod: jax.lax.slice_in_dim(trunk, int(offs[i]),
                                        int(offs[i + 1]), axis=1)
            for i, s in enumerate(lo.segments)
        }

        map_warped_prior = None
        if cfg.split_map_tar and "map" in lo.mod_order:
            emb_m, warped_m = frame_emb(TASKS["pose_map"], False)
            out_m, new_cache["map_tar"] = self._run_tar_stack_cached(
                params, "map_tar", "ln_map_tar", emb_m, cache["map_tar"],
                slot, n_valid)
            tar_emb["map"] = out_m[:, 5:, :]
            map_warped_prior = warped_m[:, 0] if warped_m is not None \
                else None

        if cfg.split_box_tar and "bbox3d" in lo.mod_order:
            emb_b, warped_b = frame_emb(TASKS["pose_map_bbox3d"], False)
            out_b, new_cache["box_tar"] = self._run_tar_stack_cached(
                params, "box_tar", "ln_box_tar", emb_b, cache["box_tar"],
                slot, n_valid)
            tar_emb["bbox3d"] = out_b[:, 5 + 1026:, :]
            if not cfg.split_map_tar:
                tar_emb["map"] = out_b[:, 5:5 + 1026, :]
                map_warped_prior = warped_b[:, 0] if warped_b is not None \
                    else None

        if cfg.map_transform and "map" in lo.mod_order \
                and map_warped_prior is not None:
            m = tar_emb["map"]
            content = m[:, 1:-1, :] + map_warped_prior
            tar_emb["map"] = jnp.concatenate(
                [m[:, :1, :], content, m[:, -1:, :]], axis=1)

        prior_seq = jnp.concatenate(
            [tar_emb[s.mod] for s in lo.segments], axis=1)
        return {"prior_seq": prior_seq, "pose_diff": pose_diff,
                "cache": new_cache}

    def ego_logits_cached(self, params, frame_inputs, cache, abs_frame):
        """Ego prediction from ONE new raw frame + the ego ring.
        frame_inputs: {mod: [B, 1, len]} with pose = motion INTO the frame.
        Returns (logits [B, 3, pose_vocab], cache)."""
        cfg = self.config
        T_max = self.t_max
        slot = jnp.asarray(abs_frame % T_max, jnp.int32)
        n_valid = jnp.minimum(abs_frame + 1, T_max).astype(jnp.int32)
        emb, _ = self._tar_input(params, frame_inputs, self.layout.mod_order,
                                 map_grid_pe=False, pose_diff=None,
                                 warp=False, t_offset=abs_frame)
        new_cache = dict(cache)
        ctx, new_cache["ego_tar"] = self._run_tar_stack_cached(
            params, "ego_tar", "ln_ego_tar", emb[:, 0], cache["ego_tar"],
            slot, n_valid)
        B = ctx.shape[0]
        q = self._ego_queries(params, ctx, B, 1, t_offset=abs_frame)
        return nn.linear(params["head_ego"], q[:, 0]), new_cache

    def prefill_ego_cache(self, params, inputs, cache):
        """Ingest the whole conditioning window into the ego ring and
        return (last-frame logits, cache).  inputs: {mod: [B, T, len]} raw
        (unshifted) window."""
        cfg = self.config
        T = inputs["pose"].shape[1]
        emb, _ = self._tar_input(params, inputs, self.layout.mod_order,
                                 map_grid_pe=False, pose_diff=None,
                                 warp=False, t_offset=0)
        new_cache = dict(cache)
        out, new_cache["ego_tar"] = self._run_tar_stack_prefill(
            params, "ego_tar", "ln_ego_tar", emb, self.t_max)
        B, T, S, D = out.shape
        q = self._ego_queries(params, out[:, -1], B, 1, t_offset=T - 1)
        return nn.linear(params["head_ego"], q[:, 0]), new_cache

    def prefill_tar_caches(self, params, shifted_inputs, cache):
        """Ingest the shifted conditioning window into the trunk/map/box
        rings and return ({"prior_seq", "pose_diff", "cache"}) for the last
        frame — the cached-mode twin of `tar_priors`."""
        cfg, lo = self.config, self.layout
        T = shifted_inputs["pose"].shape[1]
        T_max = self.t_max
        pose_diff = self.decode_pose(params, shifted_inputs["pose"])
        new_cache = dict(cache)

        emb, _ = self._tar_input(params, shifted_inputs, lo.mod_order,
                                 map_grid_pe=cfg.add_spatial_pos_embedd_on_map,
                                 pose_diff=pose_diff, t_offset=0)
        trunk, new_cache["tar"] = self._run_tar_stack_prefill(
            params, "tar", "ln_tar", emb, T_max)

        seg_lens = [s.end - s.start + 1 for s in lo.segments]
        offs = np.cumsum([0] + seg_lens)
        tar_emb = {
            s.mod: jax.lax.slice_in_dim(trunk[:, -1], int(offs[i]),
                                        int(offs[i + 1]), axis=1)
            for i, s in enumerate(lo.segments)
        }

        map_warped_prior = None
        if cfg.split_map_tar and "map" in lo.mod_order:
            emb_m, warped_m = self._tar_input(
                params, shifted_inputs, TASKS["pose_map"],
                map_grid_pe=False, pose_diff=pose_diff, t_offset=0)
            out_m, new_cache["map_tar"] = self._run_tar_stack_prefill(
                params, "map_tar", "ln_map_tar", emb_m, T_max)
            tar_emb["map"] = out_m[:, -1, 5:, :]
            map_warped_prior = warped_m[:, -1]

        if cfg.split_box_tar and "bbox3d" in lo.mod_order:
            emb_b, warped_b = self._tar_input(
                params, shifted_inputs, TASKS["pose_map_bbox3d"],
                map_grid_pe=False, pose_diff=pose_diff, t_offset=0)
            out_b, new_cache["box_tar"] = self._run_tar_stack_prefill(
                params, "box_tar", "ln_box_tar", emb_b, T_max)
            tar_emb["bbox3d"] = out_b[:, -1, 5 + 1026:, :]
            if not cfg.split_map_tar:
                tar_emb["map"] = out_b[:, -1, 5:5 + 1026, :]
                map_warped_prior = warped_b[:, -1]

        if cfg.map_transform and "map" in lo.mod_order \
                and map_warped_prior is not None:
            m = tar_emb["map"]
            content = m[:, 1:-1, :] + map_warped_prior
            tar_emb["map"] = jnp.concatenate(
                [m[:, :1, :], content, m[:, -1:, :]], axis=1)

        prior_seq = jnp.concatenate(
            [tar_emb[s.mod] for s in lo.segments], axis=1)
        return {"prior_seq": prior_seq, "pose_diff": pose_diff,
                "cache": new_cache}

    # ------------------------------------------------------------------
    # teacher-forced training logits (new: the reference repo is
    # inference-only; training support is part of this framework)
    # ------------------------------------------------------------------
    def oar_forward(self, params, oar_input) -> jnp.ndarray:
        """Full causal OAR pass over [B, S, D] (prefill / training)."""
        cfg = self.config
        block = functools.partial(nn.block_oar, n_head=cfg.n_head,
                                  attn_impl=self.attn)
        out = nn.apply_stack(params["oar"], oar_input,
                             lambda p, h: block(p, h), remat=cfg.remat)
        return nn.layer_norm(params["ln_oar"], out)


def make_model(config: ModelConfig) -> UMGen:
    return UMGen(config)
