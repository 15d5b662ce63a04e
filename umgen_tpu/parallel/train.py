"""Training step: teacher-forced next-scene objective under pjit shardings.

The public reference is inference-only (no training loop, no ``forward()``;
SURVEY §0) — this module adds the training capability natively.  The
objective mirrors the paper's two-network factorization:

  * ego loss   — the ego net's 3 query logits vs the next action tokens
  * TAR loss   — per-frame TAR content logits vs the NEXT frame's tokens
                 (+ aux-head CE on the BOS/EOS separators, the reference's
                 "d_loss" shape, ref:UMGen.py:558-582)
  * OAR loss   — teacher-forced causal pass over the final frame's full
                 2207-token stream conditioned on the TAR prior

All of it jits over a (dp, tp) mesh: batch on dp, Megatron-style tensor
parallelism from the sharding rules in umgen_tpu.parallel.mesh; activation
rematerialization via ModelConfig.remat (the reference leans on DeepSpeed /
torch checkpointing for the same purpose, ref:module.py:268-291).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from umgen_tpu.config import ModelConfig
from umgen_tpu.layout import SequenceLayout
from umgen_tpu.models import modules as nn
from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params          # trainable (no buffers)
    buffers: Params
    opt_state: Any
    step: jnp.ndarray


def split_params(params: Params) -> Tuple[Params, Params]:
    trainable = {k: v for k, v in params.items() if k != "buffers"}
    return trainable, params["buffers"]


def frame_stream(layout: SequenceLayout,
                 frame_tokens: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """{mod: [B, content_len]} → [B, seq_len] with separators."""
    B = frame_tokens[layout.mod_order[0]].shape[0]
    cols = []
    for seg in layout.segments:
        cols.append(jnp.full((B, 1), seg.bos, jnp.int32))
        cols.append(frame_tokens[seg.mod].astype(jnp.int32))
        cols.append(jnp.full((B, 1), seg.eos, jnp.int32))
    return jnp.concatenate(cols, axis=1)


def _ce(logits: jnp.ndarray, targets: jnp.ndarray,
        label_smooth: float = 0.0) -> jnp.ndarray:
    """Cross entropy; label_smooth > 0 mixes eps of uniform mass into the
    target distribution — the sharpness cap used to CALIBRATE the OAR
    verifier against the TAR draft (PERFORMANCE.md "speculative
    acceptance": the lossless rejection scheme punishes a verifier
    sharper than its draft; on few-scene synthetic data the OAR head
    overfits to loss ~0.55 while the TAR prior sits at ~1.9)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tl = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    if label_smooth > 0.0:
        return -((1.0 - label_smooth) * tl.mean()
                 + label_smooth * logp.mean())
    return -tl.mean()


class UMGenTrainer:
    def __init__(self, model: UMGen,
                 learning_rate: float = 1e-4,
                 weight_decay: float = 0.01,
                 warmup_steps: int = 1000,
                 total_steps: int = 100_000,
                 grad_clip: float = 1.0,
                 optimizer: str = "adamw",
                 oar_label_smooth: float = 0.0,
                 oar_loss_weight: float = 1.0):
        self.model = model
        self.rollout = Rollout(model)
        self.layout = model.layout
        # draft/verifier calibration knobs (see _ce): smoothing caps the
        # OAR verifier's sharpness, the weight slows its convergence
        # relative to the TAR draft
        self.oar_label_smooth = oar_label_smooth
        self.oar_loss_weight = oar_loss_weight
        warmup_steps = min(warmup_steps, max(total_steps // 10, 1))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps,
            max(total_steps, warmup_steps + 1),
            end_value=learning_rate * 0.1)
        if optimizer == "sign_sgd":
            # stateless sign-SGD: the only optimizer that trains the 2.4B
            # "larger" scale on one 16 GB chip (bf16 params 4.8 GB + bf16
            # grads 4.8 GB; adam moments alone would add ~19 GB, and
            # norm-clipped SGD's per-coordinate updates (~lr/sqrt(2.4e9))
            # round away below the bf16 ulp).  sign(g) * lr with
            # lr >= ~1e-4 clears the ulp of the ~0.02-magnitude weights.
            sign = optax.GradientTransformation(
                lambda params: optax.EmptyState(),
                lambda updates, state, params=None: (
                    jax.tree.map(jnp.sign, updates), state))
            self.tx = optax.chain(
                sign,
                optax.scale_by_schedule(lambda s: -schedule(s)))
            return
        if optimizer == "sgd":
            inner = optax.sgd(schedule)
        elif optimizer == "adamw":
            inner = optax.adamw(schedule, weight_decay=weight_decay)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            inner,
        )

    # ------------------------------------------------------------------
    def init_state(self, params: Params) -> TrainState:
        trainable, buffers = split_params(params)
        return TrainState(trainable, buffers, self.tx.init(trainable),
                          jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def loss_fn(self, trainable: Params, buffers: Params,
                batch: Dict[str, jnp.ndarray], rng: jax.Array
                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """batch: {mod: [B, T, content_len]} raw clip tokens, T >= 3."""
        model = self.model
        lo = self.layout
        params = dict(trainable)
        params["buffers"] = buffers

        raw_in = {m: batch[m][:, :-1] for m in lo.mod_order}
        shifted = dict(raw_in)
        shifted["pose"] = batch["pose"][:, 1:]

        # --- ego loss: window slot t predicts action a_t = pose[t+1] ---
        ego_emb = model.forward_ego_net(params, raw_in)       # [B, W, 3, D]
        ego_logits = nn.linear(params["head_ego"], ego_emb)
        ego_loss = _ce(ego_logits, batch["pose"][:, 1:])

        # --- TAR cascade ---
        cas = model.tar_cascade(params, shifted)
        tar_emb = cas["tar_emb"]                              # per-mod

        head_tar = {"map": "head_tar_map", "bbox3d": "head_tar_bbox3d",
                    "image": "head_tar_img", "pose": "head_tar_pose"}
        tar_loss = 0.0
        n_terms = 0
        for seg in lo.segments:
            if seg.mod == "pose":
                continue            # next-action supervision is the ego net
            # shifted window slot t holds frame t content (+ action a_t);
            # its TAR output predicts frame t+1 content
            emb_t = tar_emb[seg.mod][:, :, 1:-1]              # slots 0..W-1
            target = batch[seg.mod][:, 1:]                    # frames 1..T-1
            if seg.mod == "bbox3d" and "head_tar_n_step_bbox3d" in params:
                # multi-step head: supervise the step-0 slice (further
                # steps need t+n labels; the public checkpoints are
                # n_step=1, ref:UMGen.py:221-226).  Weight columns are
                # sliced so only the kept slice is computed.
                logits = nn.linear(
                    nn.slice_linear_out(params["head_tar_n_step_bbox3d"],
                                        model.config.bbox3d_vocab_size),
                    emb_t)
            else:
                logits = nn.linear(params[head_tar[seg.mod]], emb_t)
            tar_loss = tar_loss + _ce(logits, target)
            # separator (d-)loss on BOS/EOS positions (ref:UMGen.py:558-582)
            d_emb = tar_emb[seg.mod][:, :, (0, -1)]
            d_logits = nn.linear(params["head_tar_aux"], d_emb)
            d_tgt = jnp.broadcast_to(
                jnp.asarray([seg.bos, seg.eos]), d_logits.shape[:-1])
            tar_loss = tar_loss + 0.1 * _ce(d_logits, d_tgt)
            n_terms += 1
        tar_loss = tar_loss / max(n_terms, 1)

        # --- OAR loss on the final frame ---
        prior_seq = jnp.concatenate(
            [tar_emb[s.mod][:, -1] for s in lo.segments], axis=1)
        target_frame = {m: batch[m][:, -1] for m in lo.mod_order}
        stream = frame_stream(lo, target_frame)               # [B, 2207]
        oar_in = self.rollout.oar_inputs_from_tokens(params, stream,
                                                     prior_seq)
        h = model.oar_forward(params, oar_in)                 # [B, 2207, D]

        head_ar = {"pose": "head_ar_pose", "map": "head_ar_map",
                   "bbox3d": "head_ar_bbox3d", "image": "head_ar_img"}
        oar_loss = 0.0
        for seg in lo.segments:
            # output at input idx p-1 predicts position p; content
            # positions are seg.content_start..seg.content_end
            h_seg = h[:, seg.content_start - 1:seg.content_end]
            logits = nn.linear(params[head_ar[seg.mod]], h_seg)
            oar_loss = oar_loss + _ce(logits, target_frame[seg.mod],
                                      self.oar_label_smooth)
        oar_loss = oar_loss / len(lo.segments)

        loss = ego_loss + tar_loss + self.oar_loss_weight * oar_loss
        return loss, {"loss": loss, "ego_loss": ego_loss,
                      "tar_loss": tar_loss, "oar_loss": oar_loss}

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState,
                                            Dict[str, jnp.ndarray]]:
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, state.buffers, batch,
                                        rng)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, state.buffers, opt_state,
                          state.step + 1), metrics

    # ------------------------------------------------------------------
    def jit_train_step(self, mesh=None):
        """jit the step; with a mesh, annotate param/batch shardings so
        GSPMD partitions the whole step (dp batch, tp tensor parallel).

        The state is DONATED: without donation the old and new params
        coexist across the call (2 x 4.8 GB at the 2.4B scale — what
        OOMed the r3e single-chip training run at step 2)."""
        if mesh is None:
            return jax.jit(self.train_step, donate_argnums=(0,))

        from jax.sharding import NamedSharding, PartitionSpec as P
        from umgen_tpu.parallel.mesh import data_sharding, param_sharding

        def place(state: TrainState, batch, rng):
            pshard = param_sharding(state.params, mesh)
            bshard = param_sharding(state.buffers, mesh)
            oshard = jax.tree.map(
                lambda _: NamedSharding(mesh, P()), state.opt_state)
            state = TrainState(
                jax.device_put(state.params, pshard),
                jax.device_put(state.buffers, bshard),
                jax.device_put(state.opt_state, oshard),
                jax.device_put(state.step, NamedSharding(mesh, P())))
            batch = {k: jax.device_put(
                v, data_sharding(mesh, np.ndim(v))) for k, v in
                batch.items()}
            return state, batch

        step = jax.jit(self.train_step, donate_argnums=(0,))
        return step, place
