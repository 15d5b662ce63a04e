"""Speculative decoding of plain segments with the TAR prior as draft.

UMGen's TAR network already produces, for every frame position, logits
trained to predict that position's token (the reference itself samples from
this head under agent control and the merge rule, ref:UMGen.py:1083-1104).
That makes it a *free, position-wise independent draft model* for the OAR
decode: draft K tokens from the TAR head at the next K positions, verify
them in ONE multi-query OAR step (causal inside the chunk), and keep the
longest accepted prefix under the standard lossless rejection scheme — the
emitted stream is distributed exactly as sequential sampling from the OAR.

Sequential decode pays the full ~255 MB OAR weight stream per token; a
verify step pays it once per chunk, so throughput scales with the
acceptance rate (high when the TAR is trained — it is the frame prior).
With the fused OAR kernels enabled, verify chunks ride the multi-query
v5mq kernel (ops/decode_kernel.py): all K queries share one weight + KV
stream, so a chunk really does cost ~one sequential step of HBM traffic.

Cache discipline: each chunk pushes K inputs at cache positions
[c0+pos-1, c0+pos+K-2].  On partial acceptance the next chunk's writes
start at c0+new_pos-1 ≤ old tail, overwriting the stale entries before any
read can observe them (oar_step masks kpos < cache_len and always writes AT
cache_len).  Greedy mode reproduces the sequential greedy stream
token-for-token (tested).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umgen_tpu.models import modules as nn

Params = Dict[str, Any]


def topk_dist(logits: jnp.ndarray, k: int, temp: float
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """logits [..., V] → (probs [..., k], idx [..., k]) of the top-k
    renormalized sampling distribution."""
    vals, idx = jax.lax.top_k(logits.astype(jnp.float32), k)
    return jax.nn.softmax(vals / temp, axis=-1), idx


def dist_prob_of(token: jnp.ndarray, p: jnp.ndarray, idx: jnp.ndarray
                 ) -> jnp.ndarray:
    """Probability of `token` [...] under the sparse (p, idx) dist."""
    return jnp.sum(jnp.where(idx == token[..., None], p, 0.0), axis=-1)


def _scatter_dense(p: jnp.ndarray, idx: jnp.ndarray, V: int) -> jnp.ndarray:
    """[B, k] sparse → [B, V] dense."""
    out = jnp.zeros((p.shape[0], V), jnp.float32)
    return out.at[jnp.arange(p.shape[0])[:, None], idx].add(p)


class SpecTelemetry(NamedTuple):
    chunks: jnp.ndarray          # verify steps executed
    accepted: jnp.ndarray        # accepted draft tokens (lockstep min)


def decode_segment_speculative(rollout, params: Params, seg, state,
                               prior_seq: jnp.ndarray, head_ar: str,
                               head_tar: str, k: int, temp: float, K: int,
                               greedy: bool):
    """→ (state', tokens [B, content_len], SpecTelemetry)."""
    cfg = rollout.config
    B = state.prev_emb.shape[0]
    n = seg.content_len
    c0 = seg.content_start
    mod = seg.mod
    head_w = params[head_ar]
    V = head_w["w"].shape[-1] if "w" in head_w else head_w["wq"].shape[-1]

    # draft tables for every content position (+K pad so chunk slices are
    # always in-bounds near the segment end)
    draft_logits = nn.linear(
        params[head_tar],
        jax.lax.slice_in_dim(prior_seq, c0 - 1, c0 - 1 + n, axis=1))
    d_p, d_idx = topk_dist(draft_logits, k, temp)          # [B, n, k]
    d_p = jnp.pad(d_p, ((0, 0), (0, K), (0, 0)))
    d_p = d_p.at[:, n:, 0].set(1.0)                        # valid dists
    d_idx = jnp.pad(d_idx, ((0, 0), (0, K), (0, 0)))
    # local prior: index i ↔ global input index c0-1+i, i in [0, n+K)
    pri = jax.lax.slice_in_dim(prior_seq, c0 - 1, c0 + n, axis=1)
    pri = jnp.pad(pri, ((0, 0), (0, K - 1), (0, 0)))

    rng, seg_rng = jax.random.split(state.rng)
    chunk_keys = jax.random.split(seg_rng, max(n, 1) * 3
                                  ).reshape(n, 3, 2)
    tokens0 = jnp.zeros((B, n), jnp.int32)
    col = jnp.arange(n)[None, :]

    def cond(c):
        return c[0] < n

    def body(c):
        pos, chunk_i, kv_k, kv_v, prev_emb, tokens, acc_total = c
        keys = chunk_keys[jnp.minimum(chunk_i, n - 1)]

        dp = jax.lax.dynamic_slice_in_dim(d_p, pos, K, axis=1)
        di = jax.lax.dynamic_slice_in_dim(d_idx, pos, K, axis=1)
        if greedy:
            drafts = di[..., 0]
        else:
            choice = jax.random.categorical(keys[0], jnp.log(dp + 1e-30),
                                            axis=-1)
            drafts = jnp.take_along_axis(di, choice[..., None],
                                         axis=-1)[..., 0]       # [B, K]
        draft_prob = dist_prob_of(drafts, dp, di)

        # one multi-query verify: inputs [prev, embed(draft_0..K-2)]
        demb = rollout._embed_token(params, mod, drafts[:, :-1])
        prior_in = jax.lax.dynamic_slice_in_dim(pri, pos + 1, K - 1, axis=1)
        x = jnp.concatenate(
            [prev_emb, (demb + prior_in).astype(prev_emb.dtype)], axis=1)
        h, kv_k, kv_v = rollout.oar_step(params, x, kv_k, kv_v,
                                         cache_len=c0 + pos - 1)
        t_logits = nn.linear(params[head_ar], h)               # [B, K, V]
        t_p, t_idx = topk_dist(t_logits, k, temp)

        if greedy:
            target_tok = t_idx[..., 0]
            ok = drafts == target_tok
        else:
            tgt_prob = dist_prob_of(drafts, t_p, t_idx)
            u = jax.random.uniform(keys[1], (B, K))
            ok = u < tgt_prob / jnp.maximum(draft_prob, 1e-30)
        acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
        n_accept = jnp.sum(acc, axis=1)                        # [B]
        n_min = jnp.min(n_accept)                              # lockstep
        j = jnp.minimum(n_min, K - 1)

        if greedy:
            corrected = jnp.take_along_axis(target_tok, j[None, None]
                                            .repeat(B, 0), axis=1)[:, 0]
        else:
            pj = jnp.take_along_axis(t_p, j[None, None, None].repeat(
                B, 0), axis=1)[:, 0]
            ij = jnp.take_along_axis(t_idx, j[None, None, None].repeat(
                B, 0), axis=1)[:, 0]
            dj = jnp.take_along_axis(dp, j[None, None, None].repeat(
                B, 0), axis=1)[:, 0]
            dij = jnp.take_along_axis(di, j[None, None, None].repeat(
                B, 0), axis=1)[:, 0]
            resid = jnp.maximum(_scatter_dense(pj, ij, V)
                                - _scatter_dense(dj, dij, V), 0.0)
            resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-30)
            corrected = jax.random.categorical(
                keys[2], jnp.log(resid + 1e-30), axis=-1).astype(jnp.int32)

        # per-element emission at the boundary column: elements whose own
        # rejection came later keep their ACCEPTED draft (discarding their
        # surplus is distribution-neutral — those positions re-draft next
        # chunk); only elements rejected exactly at n_min emit corrected
        draft_at_j = jnp.take_along_axis(drafts, j[None, None].repeat(B, 0),
                                         axis=1)[:, 0]
        boundary = jnp.where(n_accept > n_min, draft_at_j, corrected)

        n_emit = jnp.minimum(jnp.minimum(n_min + 1, K), n - pos)
        kk = jnp.arange(K)[None, :]
        emit = jnp.where(kk < n_min, drafts, 0) \
            + jnp.where(kk == n_min, boundary[:, None], 0)
        emit_full = jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(tokens), emit.astype(jnp.int32), pos, axis=1)
        write_mask = (col >= pos) & (col < pos + n_emit)
        tokens = jnp.where(write_mask, emit_full, tokens)

        new_pos = pos + n_emit
        last_tok = jnp.take_along_axis(
            tokens, jnp.clip(new_pos - 1, 0, n - 1)[None, None]
            .repeat(B, 0), axis=1)[:, 0]
        lemb = rollout._embed_token(params, mod, last_tok)[:, None, :]
        lpri = jax.lax.dynamic_slice_in_dim(pri, new_pos, 1, axis=1)
        prev_emb = (lemb + lpri).astype(prev_emb.dtype)
        return (new_pos, chunk_i + 1, kv_k, kv_v, prev_emb, tokens,
                acc_total + n_min)

    carry0 = (jnp.int32(0), jnp.int32(0), state.kv_k, state.kv_v,
              state.prev_emb, tokens0, jnp.int32(0))
    pos, chunks, kv_k, kv_v, prev_emb, tokens, acc_total = \
        jax.lax.while_loop(cond, body, carry0)

    state = state._replace(kv_k=kv_k, kv_v=kv_v, prev_emb=prev_emb, rng=rng)
    return state, tokens, SpecTelemetry(chunks, acc_total)


def decode_bbox_segment_speculative(rollout, params: Params, seg, state,
                                    prior_seq: jnp.ndarray,
                                    prev_frame_bbox: jnp.ndarray,
                                    tar_box_logits: jnp.ndarray,
                                    control_mask: jnp.ndarray,
                                    K: int, greedy: bool):
    """Speculative decode of the bbox segment (660 positions).

    The sequential rules (Rollout._decode_bbox_segment,
    ref:UMGen.py:1083-1123) fold into the rejection scheme losslessly:

    * target distribution: the pad→TAR merge rule makes the emitted
      marginal a computable mixture — for an object alive last frame,
      P(t) = P_oar(t)·[t != pad] + P_oar(pad)·P_tar(t) (both top-k
      renormalized); otherwise plain top-k OAR.
    * control-overridden slots sample from the pad-masked TAR head on
      BOTH sides (draft == target → always accepted); no-born positions
      are a delta at <pad> on both sides.
    * the collision rule constraint is deterministic post-processing on
      each COMPLETED box: chunks are clamped to K <= 11, so at most one
      box completes per chunk; the constraint (with the same running
      boxes/valid/count buffers as sequential) applies to the accepted
      stream, and on a kill the acceptance is truncated at the completion
      so every later position re-drafts conditioned on the rewritten
      <pad> — exactly the sequential conditioning.  As in the sequential
      path (and the reference), already-written KV entries of killed
      tokens are NOT recomputed.

    Greedy mode reproduces the sequential greedy stream token-for-token
    (tested).  → (state', tokens [B, 660], SpecTelemetry).
    """
    from umgen_tpu.models.rollout import MAX_BOXES

    cfg = rollout.config
    B = state.prev_emb.shape[0]
    n = seg.content_len
    c0 = seg.content_start
    pad = cfg.bbox3d_vocab_size - 1
    k = cfg.top_k
    temp = cfg.sfmx_temp
    V = cfg.bbox3d_vocab_size
    K = min(K, 11)                       # <= 1 box completion per chunk
    merge_on = cfg.merge_ar_tar and not cfg.only_ar
    buf = params["buffers"]

    # --- per-position draft tables (+K pad so slices stay in-bounds) ---
    d_p, d_idx = topk_dist(tar_box_logits, k, temp)        # [B, n, k]
    ctrl_logits = tar_box_logits.at[:, :, -1].set(-jnp.inf)
    c_p, c_idx = topk_dist(ctrl_logits, k, temp)

    def pad_k(a):                         # [B, n, k] → [B, n+K, k]
        a = jnp.pad(a, ((0, 0), (0, K), (0, 0)))
        return a.at[:, n:, 0].set(1.0) if a.dtype == jnp.float32 else a

    d_p, d_idx = pad_k(d_p), jnp.pad(d_idx, ((0, 0), (0, K), (0, 0)))
    c_p, c_idx = pad_k(c_p), jnp.pad(c_idx, ((0, 0), (0, K), (0, 0)))

    # per-position flags (padded region: free, non-ctrl, not newborn)
    pos_idx = jnp.arange(n + K)
    ctrl_obj = jnp.minimum((pos_idx + 1) // 11, 60)
    is_ctrl_tab = jnp.where((pos_idx < n)[None, :],
                            control_mask[:, ctrl_obj], False)  # [B, n+K]
    prev_tab = jnp.pad(prev_frame_bbox, ((0, 0), (0, K)),
                       constant_values=0)                      # [B, n+K]
    prev_pad_tab = jnp.where((pos_idx < n)[None, :],
                             prev_tab == pad, False)

    # local prior: index i ↔ global input index c0-1+i
    pri = jax.lax.slice_in_dim(prior_seq, c0 - 1, c0 + n, axis=1)
    pri = jnp.pad(pri, ((0, 0), (0, K - 1), (0, 0)))

    # collision buffers: slot 0 = ego box (ref:UMGen.py:1320-1336)
    boxes0 = jnp.zeros((B, MAX_BOXES, 10), jnp.float32)
    boxes0 = boxes0.at[:, 0].set(jnp.asarray(rollout._ego_box))
    valid0 = jnp.zeros((B, MAX_BOXES), bool).at[:, 0].set(True)
    nbox0 = jnp.ones((B,), jnp.int32)

    def decode_candidate(win):
        attr = jnp.clip(win[:, :10], 0, 1023)
        vals = buf["agent_bin_mid"][attr]
        return vals * buf["agent_span"] + buf["agent_lo"]

    rng, seg_rng = jax.random.split(state.rng)
    chunk_keys = jax.random.split(seg_rng, max(n, 1) * 3).reshape(n, 3, 2)
    tokens0 = jnp.zeros((B, n), jnp.int32)
    col = jnp.arange(n)[None, :]

    def q_of(tok, dp, di, cp, ci, is_ctrl, prev_pad):
        """Draft-dist probability of `tok` under the per-position switch."""
        q = dist_prob_of(tok, dp, di)
        q = jnp.where(is_ctrl, dist_prob_of(tok, cp, ci), q)
        if cfg.no_born:
            q = jnp.where(prev_pad, (tok == pad).astype(jnp.float32), q)
        return q

    def p_of(tok, tp, ti, dp, di, cp, ci, is_ctrl, prev_pad):
        """Target probability: top-k OAR composed with the decode rules."""
        p = dist_prob_of(tok, tp, ti)
        if merge_on:
            p_oar_pad = dist_prob_of(jnp.full_like(tok, pad), tp, ti)
            p_tar = dist_prob_of(tok, dp, di)
            p_merge = (p * (tok != pad) + p_oar_pad * p_tar)
            p = jnp.where(~prev_pad & ~is_ctrl, p_merge, p)
        p = jnp.where(is_ctrl, dist_prob_of(tok, cp, ci), p)
        if cfg.no_born:
            p = jnp.where(prev_pad, (tok == pad).astype(jnp.float32), p)
        return p

    def greedy_target(tp, ti, di0, ci0, is_ctrl, prev_pad):
        t = ti[..., 0]
        if merge_on:
            t = jnp.where((t == pad) & ~prev_pad & ~is_ctrl, di0, t)
        t = jnp.where(is_ctrl, ci0, t)
        if cfg.no_born:
            t = jnp.where(prev_pad, pad, t)
        return t

    def cond(c):
        return c[0] < n

    def body(c):
        (pos, chunk_i, kv_k, kv_v, prev_emb, tokens, acc_total,
         boxes, bvalid, nbox) = c
        keys = chunk_keys[jnp.minimum(chunk_i, n - 1)]

        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, pos, K, axis=1)
        dp, di, cp, ci = sl(d_p), sl(d_idx), sl(c_p), sl(c_idx)
        is_ctrl = sl(is_ctrl_tab)
        prev_pad = sl(prev_pad_tab)

        if greedy:
            drafts = jnp.where(is_ctrl, ci[..., 0], di[..., 0])
        else:
            base = jax.random.categorical(keys[0], jnp.log(dp + 1e-30),
                                          axis=-1)
            ctrl = jax.random.categorical(
                jax.random.fold_in(keys[0], 1), jnp.log(cp + 1e-30),
                axis=-1)
            drafts = jnp.where(
                is_ctrl,
                jnp.take_along_axis(ci, ctrl[..., None], axis=-1)[..., 0],
                jnp.take_along_axis(di, base[..., None], axis=-1)[..., 0])
        if cfg.no_born:
            drafts = jnp.where(prev_pad, pad, drafts)
        draft_prob = q_of(drafts, dp, di, cp, ci, is_ctrl, prev_pad)

        # one multi-query verify step
        demb = rollout._embed_token(params, "bbox3d", drafts[:, :-1])
        prior_in = jax.lax.dynamic_slice_in_dim(pri, pos + 1, K - 1, axis=1)
        x = jnp.concatenate(
            [prev_emb, (demb + prior_in).astype(prev_emb.dtype)], axis=1)
        h, kv_k, kv_v = rollout.oar_step(params, x, kv_k, kv_v,
                                         cache_len=c0 + pos - 1)
        t_logits = nn.linear(params["head_ar_bbox3d"], h)     # [B, K, V]
        t_p, t_idx = topk_dist(t_logits, k, temp)

        if greedy:
            target_tok = greedy_target(t_p, t_idx, di[..., 0], ci[..., 0],
                                       is_ctrl, prev_pad)
            ok = drafts == target_tok
        else:
            tgt_prob = p_of(drafts, t_p, t_idx, dp, di, cp, ci,
                            is_ctrl, prev_pad)
            u = jax.random.uniform(keys[1], (B, K))
            ok = u < tgt_prob / jnp.maximum(draft_prob, 1e-30)
        acc = jnp.cumprod(ok.astype(jnp.int32), axis=1)
        n_accept = jnp.sum(acc, axis=1)
        n_min = jnp.min(n_accept)
        j = jnp.minimum(n_min, K - 1)

        take = lambda a: jnp.take_along_axis(
            a, j[None, None].repeat(B, 0), axis=1)[:, 0]
        take3 = lambda a: jnp.take_along_axis(
            a, j[None, None, None].repeat(B, 0), axis=1)[:, 0]

        if greedy:
            corrected = take(target_tok)
        else:
            # dense residual max(p - q, 0) at the boundary column
            tpj, tij = take3(t_p), take3(t_idx)
            dpj, dij = take3(dp), take3(di)
            cpj, cij = take3(cp), take3(ci)
            ctrl_j = take(is_ctrl.astype(jnp.int32)) == 1
            ppad_j = take(prev_pad.astype(jnp.int32)) == 1

            p_dense = _scatter_dense(tpj, tij, V)
            if merge_on:
                p_oar_pad = p_dense[:, pad]
                p_m = p_dense.at[:, pad].set(0.0) \
                    + p_oar_pad[:, None] * _scatter_dense(dpj, dij, V)
                p_dense = jnp.where((~ppad_j & ~ctrl_j)[:, None],
                                    p_m, p_dense)
            p_dense = jnp.where(ctrl_j[:, None],
                                _scatter_dense(cpj, cij, V), p_dense)
            q_dense = _scatter_dense(dpj, dij, V)
            q_dense = jnp.where(ctrl_j[:, None],
                                _scatter_dense(cpj, cij, V), q_dense)
            if cfg.no_born:
                delta = jnp.zeros((B, V)).at[:, pad].set(1.0)
                p_dense = jnp.where(ppad_j[:, None], delta, p_dense)
                q_dense = jnp.where(ppad_j[:, None], delta, q_dense)
            resid = jnp.maximum(p_dense - q_dense, 0.0)
            resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-30)
            corrected = jax.random.categorical(
                keys[2], jnp.log(resid + 1e-30), axis=-1).astype(jnp.int32)

        draft_at_j = take(drafts)
        boundary = jnp.where(n_accept > n_min, draft_at_j, corrected)

        n_emit = jnp.minimum(jnp.minimum(n_min + 1, K), n - pos)
        kk = jnp.arange(K)[None, :]
        emit = jnp.where(kk < n_min, drafts, 0) \
            + jnp.where(kk == n_min, boundary[:, None], 0)
        emit_full = jax.lax.dynamic_update_slice_in_dim(
            jnp.zeros_like(tokens), emit.astype(jnp.int32), pos, axis=1)
        write_mask = (col >= pos) & (col < pos + n_emit)
        tokens = jnp.where(write_mask, emit_full, tokens)

        # --- rule constraint at the (single) completed box, if emitted ---
        if cfg.rule_constrain:
            i_c = pos + jnp.mod(10 - pos, 11)        # first attr==10 >= pos

            def apply_constraint(args):
                tokens, boxes, bvalid, nbox, n_emit = args
                win = jax.lax.dynamic_slice_in_dim(tokens, i_c - 10, 11,
                                                   axis=1)
                tok_c = win[:, -1]
                cand = decode_candidate(win)
                from umgen_tpu.ops.collision import candidate_collides
                collide = candidate_collides(cand, boxes, bvalid)
                newborn = jnp.take_along_axis(
                    prev_pad_tab, i_c[None, None].repeat(B, 0),
                    axis=1)[:, 0]
                too_many = (nbox + 1) > 30
                alive = tok_c != pad
                kill = alive & newborn & (collide | too_many)
                keep = alive & ~kill
                boxes = jnp.where(
                    keep[:, None, None],
                    jax.vmap(lambda b, cd, m: b.at[m].set(cd))(
                        boxes, cand, nbox),
                    boxes)
                bvalid = jnp.where(
                    keep[:, None],
                    jax.vmap(lambda v, m: v.at[m].set(True))(bvalid, nbox),
                    bvalid)
                nbox = nbox + keep.astype(jnp.int32)
                pads = jnp.full((B, 11), pad, jnp.int32)
                repl = jnp.where(kill[:, None], pads, win)
                tokens = jax.lax.dynamic_update_slice_in_dim(
                    tokens, repl, i_c - 10, axis=1)
                # a kill rewrites the emitted stream: everything after the
                # completion re-drafts next chunk, conditioned on the pads
                n_emit = jnp.where(jnp.any(kill), i_c - pos + 1, n_emit)
                return tokens, boxes, bvalid, nbox, n_emit

            tokens, boxes, bvalid, nbox, n_emit = jax.lax.cond(
                i_c < pos + n_emit, apply_constraint, lambda a: a,
                (tokens, boxes, bvalid, nbox, n_emit))

        new_pos = pos + n_emit
        last_tok = jnp.take_along_axis(
            tokens, jnp.clip(new_pos - 1, 0, n - 1)[None, None]
            .repeat(B, 0), axis=1)[:, 0]
        lemb = rollout._embed_token(params, "bbox3d", last_tok)[:, None, :]
        lpri = jax.lax.dynamic_slice_in_dim(pri, new_pos, 1, axis=1)
        prev_emb = (lemb + lpri).astype(prev_emb.dtype)
        return (new_pos, chunk_i + 1, kv_k, kv_v, prev_emb, tokens,
                acc_total + n_min, boxes, bvalid, nbox)

    carry0 = (jnp.int32(0), jnp.int32(0), state.kv_k, state.kv_v,
              state.prev_emb, tokens0, jnp.int32(0), boxes0, valid0, nbox0)
    (pos, chunks, kv_k, kv_v, prev_emb, tokens, acc_total,
     boxes, bvalid, nbox) = jax.lax.while_loop(cond, body, carry0)

    state = state._replace(kv_k=kv_k, kv_v=kv_v, prev_emb=prev_emb, rng=rng)
    return state, tokens, SpecTelemetry(chunks, acc_total)
