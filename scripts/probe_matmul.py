"""Probe v5e matmul MFU at the cached-TAR shapes.

PERFORMANCE.md records the cached TAR cascade as FLOP-bound at a measured
72-73 TF/s matmul rate for [4414, 768] @ [768, N] — only ~37% of the 197
TF/s bf16 peak.  This probe isolates why: M alignment (4414 = 2*2207 is not
a multiple of the 16-row bf16 tile), K depth (768), dequant fusion, and
batched-einsum formulations, each timed as a >=64-iteration scan (relay
hygiene: short scans carry 10-30 ms/call inflation — PERFORMANCE.md).

Run on the real chip: python scripts/probe_matmul.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=512, warmup=2):
    # Forced-completion timing: block_until_ready is unreliable through the
    # axon relay (PERFORMANCE.md) — reduce the carry to one scalar in-graph
    # and fetch it to host.
    def run(*a):
        carry = jax.lax.scan(
            lambda c, _: (fn(*c), None), a, None, length=iters)[0]
        return jnp.sum(carry[0].astype(jnp.float32))

    jfn = jax.jit(run)
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    float(jfn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt


def probe_mm(M, K, N, dtype=jnp.bfloat16, dequant=False, label=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.float32).astype(dtype)
    if dequant:
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.full((N,), 0.01, jnp.float32)

    def fold(x, y):
        # fold ALL output columns back into the [M, K] carry so no part of
        # the matmul is dead code; scale down to keep values finite
        M = x.shape[0]
        pad = (-y.shape[1]) % K
        yp = jnp.pad(y, ((0, 0), (0, pad))).reshape(M, -1, K).sum(1)
        return (x + 1e-3 * yp).astype(x.dtype)

    if dequant:
        w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        ws = jnp.full((N,), 0.01, jnp.float32)

        def fn(x, w8, ws):
            w = w8.astype(x.dtype) * ws.astype(x.dtype)
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (fold(x, y), w8, ws)
        args = (x, w8, ws)
    else:
        w = jax.random.normal(key, (K, N), jnp.float32).astype(dtype) * 0.01

        def fn(x, w):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (fold(x, y), w)
        args = (x, w)
    dt = timed(fn, *args)
    tf = 2 * M * K * N / dt / 1e12
    print(f"{label or f'[{M},{K}]@[{K},{N}]'} {dtype.__name__}"
          f"{' dequant' if dequant else ''}: {dt*1e6:8.1f} us  {tf:6.1f} TF/s")
    return tf


def main():
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    D = 768
    # the cached-TAR shapes (B=2 → M = 2*2207 rows)
    for M in (4414, 4416, 4480, 8192):
        probe_mm(M, D, 4 * D)
    # K depth sensitivity at fixed output FLOPs
    probe_mm(4416, 1536, 2 * D, label="[4416,1536]@[1536,1536] (deep K)")
    probe_mm(4416, D, 3 * D, label="qkv [4416,768]@[768,2304]")
    probe_mm(4416, D, D, label="proj [4416,768]@[768,768]")
    # dequant-int8 formulation (the XLA serving path)
    probe_mm(4414, D, 4 * D, dequant=True)
    probe_mm(4416, D, 4 * D, dequant=True)
    # fp32 accumulation reference at a fat shape
    probe_mm(8192, 2048, 8192, label="fat [8192,2048]@[2048,8192]")


if __name__ == "__main__":
    main()
