"""Microbenchmark for the fused OAR decode-step kernels (real TPU).

Measures steady-state per-step latency of each kernel generation at the
flagship shape (L=36, d=768, H=16, Dh=48, S=2208) for B in {1, 2} plus the
XLA oar_step reference. Usage:

    python scripts/bench_decode_kernel.py [--versions v2,v3,v4] [--b 1,2]
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


def make_params(L, d, rng):
    k = iter(jax.random.split(jax.random.PRNGKey(rng), 64))

    def w(shape, scale=0.02):
        return (jax.random.normal(next(k), shape, jnp.float32) * scale)

    return {
        "ln1": {"w": jnp.ones((L, d))},
        "ln2": {"w": jnp.ones((L, d))},
        "attn": {
            "qkv": {"w": w((L, d, 3 * d)), "b": w((L, 3 * d))},
            "proj": {"w": w((L, d, d)), "b": w((L, d))},
        },
        "mlp": {
            "fc": {"w": w((L, d, 4 * d))},
            "proj": {"w": w((L, 4 * d, d))},
        },
    }


def quantize(p):
    from umgen_tpu.runtime.quantize import _quantize_linear

    def walk(t, name):
        if isinstance(t, dict):
            if "w" in t and name in ("qkv", "proj", "fc"):
                return _quantize_linear(t)
            return {k: walk(v, k) for k, v in t.items()}
        return t

    return walk(p, "")


def timeit(fn, n=20):
    fn()  # compile + warm
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--versions", default="v3,v4")
    ap.add_argument("--b", default="1,2")
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--steps", type=int, default=64,
                    help="sequential steps per timing rep (amortizes host "
                         "dispatch; per-step time is reported)")
    ap.add_argument("--s", type=int, default=2208,
                    help="cache length (rollout segment slices: 1031 map, "
                         "1693 bbox, 2207 image)")
    args = ap.parse_args()

    from umgen_tpu.ops import decode_kernel as dk

    L, d, H, Dh, S = 36, 768, 16, 48, args.s
    params = quantize(make_params(L, d, 0))

    for B in [int(x) for x in args.b.split(",")]:
        x = jnp.zeros((B, 1, d), jnp.bfloat16)
        kv_shape = (L, B, S, H, Dh)
        kv_i8 = (jnp.zeros(kv_shape, jnp.int8),
                 jnp.zeros(kv_shape, jnp.int8))
        cl = jnp.asarray(S - 8, jnp.int32)

        for v in args.versions.split(","):
            mq = 0
            if v == "v2":
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v2
            elif v == "v3":
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v3
            elif v == "v4":
                packed = dk.pack_fused_oar_v4(params)
                fn = dk.fused_decode_step_v4
            elif v == "v7":
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v7
                shape = (L, B, S, H * Dh)      # flat cache required
            elif v == "v5":
                # NB "v5" benches the serving layout (flat [L,B,S,H*Dh]
                # cache).  The head-split 5-D cache — which costs a
                # physical whole-cache relayout copy per step — is
                # available as "v5head"; an earlier version of this
                # script silently used it for "v5", which made v7 look
                # 3.5x faster than it is.
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v5
                shape = (L, B, S, H * Dh)
            elif v == "v5head":
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v5
            elif v == "v6":
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v6
                shape = (L, B, S, H * Dh)
            elif v.startswith("v5flat"):
                packed = dk.pack_fused_oar(params)
                bs = int(v[7:]) if len(v) > 7 else 0
                fn = functools.partial(dk.fused_decode_step_v5, block_s=bs)
                shape = (L, B, S, H * Dh)      # 4-D lane-aligned cache
            elif v.startswith("v5bb"):         # batch-split grid, e.g. v5bb2
                if not v[4:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected v5bbN)")
                    continue
                packed = dk.pack_fused_oar(params)
                fn = functools.partial(dk.fused_decode_step_v5,
                                       batch_block=int(v[4:]))
                shape = (L, B, S, H * Dh)
            elif v.startswith("v5mqi4"):       # int4 multi-query, v5mqi4Q
                if not v[6:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected v5mqi4Q)")
                    continue
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v5mqi4
                shape = "i4"
                mq = int(v[6:])
            elif v.startswith("v5mq"):         # multi-query verify, v5mqQ
                if not v[4:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected v5mqQ, e.g. v5mq8)")
                    continue
                packed = dk.pack_fused_oar(params)
                fn = dk.fused_decode_step_v5mq
                shape = (L, B, S, H * Dh)
                mq = int(v[4:])
            elif v.startswith("v5i4"):         # int4 KV; v5i4bbN splits
                tail = v[6:] if v.startswith("v5i4bb") else ""
                if v.startswith("v5i4bb") and not tail.isdigit():
                    print(f"B={B} {v}: SKIPPED (expected v5i4bbN)")
                    continue
                packed = dk.pack_fused_oar(params)
                fn = functools.partial(dk.fused_decode_step_v5i4,
                                       batch_block=int(tail) if tail else 0)
                shape = "i4"                   # packed cache + scale planes
            elif v.startswith("w4mqi4"):       # W4A8 int4-KV multi-query
                if not v[6:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected w4mqi4Q)")
                    continue
                packed = dk.pack_fused_oar_w4(make_params(L, d, 0))
                fn = dk.fused_decode_step_w4mqi4
                shape = "i4"
                mq = int(v[6:])
            elif v.startswith("w4mq"):         # W4A8 multi-query, w4mqQ
                if not v[4:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected w4mqQ)")
                    continue
                packed = dk.pack_fused_oar_w4(make_params(L, d, 0))
                fn = dk.fused_decode_step_w4mq
                shape = (L, B, S, H * Dh)
                mq = int(v[4:])
            elif v.startswith("w4i4"):         # int4 weights + int4 KV
                tail = v[6:] if v.startswith("w4i4bb") else ""
                if v.startswith("w4i4bb") and not tail.isdigit():
                    print(f"B={B} {v}: SKIPPED (expected w4i4bbN)")
                    continue
                packed = dk.pack_fused_oar_w4(make_params(L, d, 0))
                fn = functools.partial(dk.fused_decode_step_w4i4,
                                       batch_block=int(tail) if tail else 0)
                shape = "i4"
            elif v.startswith("w4"):           # W4A8; w4bbN = batch-split
                if v.startswith("w4bb") and not v[4:].isdigit():
                    print(f"B={B} {v}: SKIPPED (expected w4bbN)")
                    continue
                packed = dk.pack_fused_oar_w4(make_params(L, d, 0))
                bb = int(v[4:]) if v.startswith("w4bb") else 0
                fn = functools.partial(dk.fused_decode_step_w4,
                                       batch_block=bb)
                shape = (L, B, S, H * Dh)
            else:
                continue
            if not (v.startswith(("v5flat", "v5bb", "v5mq", "v5i4", "w4"))
                    or v in ("v5", "v6", "v7")):
                shape = kv_shape

            try:
                if shape == "i4":
                    @functools.partial(jax.jit,
                                       donate_argnums=(2, 3, 4, 5))
                    def many4(packed, x, kk, vv, ks, vs, fn=fn):
                        def body(c, _):
                            x, kk, vv, ks, vs = c
                            h, kk, vv, ks, vs = fn(packed, x, kk, vv, ks,
                                                   vs, cl, n_head=H)
                            return (h, kk, vv, ks, vs), ()

                        c, _ = jax.lax.scan(body, (x, kk, vv, ks, vs),
                                            None, length=args.steps)
                        return c

                    kk = jnp.zeros((L, B, S, H * Dh // 2), jnp.int8)
                    vv = jnp.zeros((L, B, S, H * Dh // 2), jnp.int8)
                    ks = jnp.ones((L, B, S, H), jnp.float32)
                    vs = jnp.ones((L, B, S, H), jnp.float32)
                    xq = (jnp.zeros((B, mq, d), jnp.bfloat16) if mq else x)

                    def rep():
                        nonlocal kk, vv, ks, vs
                        x2, kk, vv, ks, vs = many4(packed, xq, kk, vv,
                                                   ks, vs)
                        return x2
                else:
                    @functools.partial(jax.jit, donate_argnums=(2, 3))
                    def many(packed, x, kk, vv, fn=fn):
                        def body(c, _):
                            x, kk, vv = c
                            h, kk, vv = fn(packed, x, kk, vv, cl,
                                           n_head=H)
                            return (h, kk, vv), ()

                        (h, kk, vv), _ = jax.lax.scan(body, (x, kk, vv),
                                                      None,
                                                      length=args.steps)
                        return h, kk, vv

                    kk = jnp.zeros(shape, jnp.int8)
                    vv = jnp.zeros(shape, jnp.int8)
                    xq = (jnp.zeros((B, mq, d), jnp.bfloat16) if mq else x)

                    def rep():
                        nonlocal kk, vv
                        h, kk, vv = many(packed, xq, kk, vv)
                        return h

                dt = timeit(rep, n=args.n) / args.steps
                print(f"B={B} {v}: {dt*1e3:.3f} ms/step")
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {v}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
