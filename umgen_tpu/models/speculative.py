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
