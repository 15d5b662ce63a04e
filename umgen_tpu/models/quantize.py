"""Training-time quantizers — functional JAX rebuilds of the reference's
quantizer zoo (ref:projects/tokenizer/quantize.py).

The shipped VQ checkpoints were trained with ``NormEMAVectorQuantizer``
(l2-normalized codes, EMA codebook updates, distributed code-usage sync,
ref:quantize.py:371-479).  The torch version mutates buffers in-place and
calls ``torch.distributed.all_reduce``; here the quantizer is a pure
function over an explicit :class:`EMAState` pytree, and the cross-replica
sync is a ``jax.lax.psum`` over an optional mesh ``axis_name`` — drop it
into a ``shard_map``/``pjit`` data-parallel training step and every
replica applies identical codebook updates.

Also here: cosine-similarity k-means codebook init (ref:quantize.py:23-60)
and :class:`DiagonalGaussian` (ref:quantize.py:482-533), the KL-VAE
posterior used by the autoencoder variants.

Inference-path quantization (nearest-code lookup) lives in
``models/vq.py``; weight-only int8 lives in ``runtime/quantize.py``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class EMAState(NamedTuple):
    """Codebook state carried across training steps (pytree)."""
    embedding: jnp.ndarray      # (K, D), l2-normalized rows
    cluster_size: jnp.ndarray   # (K,) EMA code-usage counts
    initted: jnp.ndarray        # () bool — False until k-means init ran


def init_ema_state(key: jax.Array, n_codes: int, dim: int,
                   kmeans_init: bool = False,
                   codebook: Optional[np.ndarray] = None) -> EMAState:
    """Random l2-normed init, or zeros awaiting k-means on the first batch
    (ref:quantize.py:290-328)."""
    if codebook is not None:
        emb = l2norm(jnp.asarray(codebook, jnp.float32))
        initted = jnp.asarray(True)
    elif kmeans_init:
        emb = jnp.zeros((n_codes, dim), jnp.float32)
        initted = jnp.asarray(False)
    else:
        emb = l2norm(jax.random.normal(key, (n_codes, dim), jnp.float32))
        initted = jnp.asarray(True)
    return EMAState(emb, jnp.zeros((n_codes,), jnp.float32), initted)


def kmeans_cosine(key: jax.Array, data: jnp.ndarray, n_codes: int,
                  iters: int = 10) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity k-means over (N, D) samples → (codebook (K, D),
    cluster sizes (K,)) (ref:quantize.py:23-60: sample init, argmax-sim
    assignment, mean, l2norm; empty clusters keep their previous mean)."""
    n = data.shape[0]
    data = l2norm(data)
    idx = jax.random.choice(key, n, (n_codes,), replace=n < n_codes)
    means = data[idx]

    def step(means, _):
        sim = data @ means.T                       # (N, K)
        assign = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(assign, n_codes, dtype=data.dtype)
        counts = onehot.sum(0)                     # (K,)
        sums = onehot.T @ data                     # (K, D)
        new = jnp.where(counts[:, None] > 0,
                        l2norm(sums / jnp.maximum(counts[:, None], 1.0)),
                        means)
        return new, counts

    means, counts = jax.lax.scan(step, means, None, length=iters)
    return means, counts[-1]


def norm_ema_quantize(state: EMAState, z: jnp.ndarray, *,
                      train: bool, decay: float = 0.99, beta: float = 1.0,
                      eps: float = 1e-5,
                      axis_name: Optional[str] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 EMAState]:
    """One NormEMA-VQ step (ref:quantize.py:414-479).

    z: (..., D) channel-last features → (z_q straight-through, commit loss,
    indices (...,), new state).  With ``axis_name`` set (inside shard_map /
    pjit with a named axis), code counts and embed sums are psum-reduced so
    all replicas step the codebook identically — the reference's
    ``torch.distributed.all_reduce`` (ref:quantize.py:438-455).
    """
    zf = l2norm(z.astype(jnp.float32)).reshape(-1, z.shape[-1])
    emb = state.embedding
    d = (jnp.sum(zf ** 2, 1, keepdims=True) + jnp.sum(emb ** 2, 1)
         - 2.0 * zf @ emb.T)
    indices = jnp.argmin(d, axis=-1)
    z_q = emb[indices].reshape(z.shape)

    onehot = jax.nn.one_hot(indices, emb.shape[0], dtype=jnp.float32)
    bins = onehot.sum(0)
    embed_sum = zf.T @ onehot                     # (D, K)
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)

    new_cluster = state.cluster_size * decay + bins * (1.0 - decay)
    if train:
        safe_bins = jnp.where(bins == 0, 1.0, bins)
        embed_norm = l2norm((embed_sum / safe_bins).T)  # (K, D)
        embed_norm = jnp.where((bins == 0)[:, None], emb, embed_norm)
        new_emb = l2norm(emb * decay + embed_norm * (1.0 - decay))
        new_state = EMAState(new_emb, new_cluster, state.initted)
    else:
        new_state = EMAState(emb, new_cluster, state.initted)

    zn = l2norm(z.astype(jnp.float32))
    loss = beta * jnp.mean((jax.lax.stop_gradient(z_q) - zn) ** 2)
    z_q = zn + jax.lax.stop_gradient(z_q - zn)    # straight-through
    return z_q.astype(z.dtype), loss, indices.reshape(z.shape[:-1]), \
        new_state


def maybe_kmeans_init(state: EMAState, z: jnp.ndarray,
                      key: jax.Array, iters: int = 10) -> EMAState:
    """Host-side helper: run k-means init on the first batch if the state
    is uninitialized (ref:quantize.py:329-338).  Call OUTSIDE jit once."""
    if bool(state.initted):
        return state
    zf = l2norm(jnp.asarray(z, jnp.float32)).reshape(-1, z.shape[-1])
    emb, counts = kmeans_cosine(key, zf, state.embedding.shape[0], iters)
    return EMAState(emb, counts.astype(jnp.float32), jnp.asarray(True))


class DiagonalGaussian:
    """Diagonal-Gaussian VAE posterior (ref:quantize.py:482-533).

    parameters: (..., 2C) channel-last mean‖logvar (the torch version
    chunks dim=1 / NCHW; channel-last is the JAX layout).
    """

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        if deterministic:
            self.std = self.var = jnp.zeros_like(mean)
        else:
            self.std = jnp.exp(0.5 * self.logvar)
            self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0])
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mean ** 2 + self.var - 1.0
                                 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=axes)

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0])
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(logtwopi + self.logvar
                             + (sample - self.mean) ** 2 / self.var,
                             axis=axes)

    def mode(self) -> jnp.ndarray:
        return self.mean
