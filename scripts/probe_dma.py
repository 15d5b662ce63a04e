"""DMA ablation probe for the fused decode kernel's block structure.

Streams exactly v3's per-(layer, s-block) input blocks through a kernel
whose compute is a trivial touch-reduce, isolating the DMA pipeline cost
from the real kernel's compute. Variants:

  v3        — v3's six streams (vec, wqp, wfc lagged, wpj lagged, kvk, kvv)
  kvonly    — only the two KV streams
  wonly     — only the three weight streams
  fat       — weights as ONE [d, 8d] block + KV as ONE [B, bs, 2*HD] block
  nsX       — v3 streams with bs chosen for NS=X s-blocks

Usage: python scripts/probe_dma.py [--b 1,2] [--variants v3,kvonly,wonly]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L, D, H, Dh, S = 36, 768, 16, 48, 2208
HD = H * Dh
V = 11520  # packed vec width


def probe(B, bs, streams, n_steps, reps, semantics="arbitrary"):
    NS = S // bs

    specs = []
    args = []
    nbytes = 0
    if "vec" in streams:
        specs.append(pl.BlockSpec((1, 1, V), lambda l, ns, *_: (l, 0, 0)))
        args.append(jnp.ones((L, 1, V), jnp.float32))
        nbytes += 4 * V
    if "w" in streams:
        lag = lambda k: min(k, NS - 1)  # noqa: E731

        def lagged(shape, lag_ns):
            return pl.BlockSpec(
                (1,) + shape,
                lambda l, ns, *_, _lag=lag_ns: (
                    jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

        specs += [pl.BlockSpec((1, D, 4 * D), lambda l, ns, *_: (l, 0, 0)),
                  lagged((D, 4 * D), lag(2)), lagged((4 * D, D), lag(1))]
        args += [jnp.ones((L, D, 4 * D), jnp.int8),
                 jnp.ones((L, D, 4 * D), jnp.int8),
                 jnp.ones((L, 4 * D, D), jnp.int8)]
        nbytes += 3 * D * 4 * D
    if "wfat" in streams:
        specs.append(pl.BlockSpec((1, D, 12 * D), lambda l, ns, *_: (l, 0, 0)))
        args.append(jnp.ones((L, D, 12 * D), jnp.int8))
        nbytes += 12 * D * D
    if "kv" in streams:
        def kv_spec():
            return pl.BlockSpec((1, B, bs, HD),
                                lambda l, ns, *_: (l, 0, ns, 0))

        specs += [kv_spec(), kv_spec()]
        args += [jnp.ones((L, B, S, HD), jnp.int8),
                 jnp.ones((L, B, S, HD), jnp.int8)]
        nbytes += 2 * B * S * HD
    if "kvfat" in streams:
        specs.append(pl.BlockSpec((1, B, bs, 2 * HD),
                                  lambda l, ns, *_: (l, 0, ns, 0)))
        args.append(jnp.ones((L, B, S, 2 * HD), jnp.int8))
        nbytes += 2 * B * S * HD

    def kernel(seed_ref, *refs):
        ins = refs[:-1]
        out = refs[-1]
        l = pl.program_id(0)
        ns = pl.program_id(1)

        @pl.when((l == L - 1) & (ns == NS - 1))
        def _():
            acc = seed_ref[...]
            for r in ins:
                idx = (0,) * (len(r.shape) - 2) \
                    + (slice(0, 8), slice(0, 128))
                acc = acc + r[idx].astype(jnp.float32)
            out[...] = acc

    f = pl.pallas_call(
        kernel,
        grid=(L, NS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics, semantics),
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def many(*args):
        def body(c, _):
            return f(c, *args), ()

        c, _ = jax.lax.scan(body, jnp.zeros((8, 128), jnp.float32), None,
                            length=n_steps)
        return c

    np.asarray(many(*args))  # compile+warm
    np.asarray(many(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = many(*args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps / n_steps
    nbytes *= L          # per-call total: every layer streams its blocks
    gbps = nbytes / dt / 1e9
    return dt, nbytes, gbps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="1,2")
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    cases = [
        ("v3 streams (bs=552)", 552, ["vec", "w", "kv"], "arbitrary"),
        ("weights only", 552, ["vec", "w"], "arbitrary"),
        ("kv only", 552, ["kv"], "arbitrary"),
        ("fat blocks", 552, ["vec", "wfat", "kvfat"], "arbitrary"),
        ("v3 bs=368 (NS=6)", 368, ["vec", "w", "kv"], "arbitrary"),
        ("v3 bs=184 (NS=12)", 184, ["vec", "w", "kv"], "arbitrary"),
    ]
    for B in [int(x) for x in args.b.split(",")]:
        for name, bs, streams, sem in cases:
            try:
                dt, nb, gbps = probe(B, bs, streams, args.steps, args.reps,
                                     sem)
                print(f"B={B} {name:24s}: {dt*1e3:7.3f} ms/step  "
                      f"{nb/1e6:6.1f} MB  {gbps:6.1f} GB/s")
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {name:24s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
