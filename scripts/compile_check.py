"""AOT-compile the fused decode kernels on the TPU backend (no execution).

Catches Mosaic lowering regressions in seconds per kernel — the relay's
compile helper is chipless, so this works even when the chip is busy.

    python scripts/compile_check.py [--versions v5,w4,...] [--b 2] [--l 4]
"""

import argparse
import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench_decode_kernel import make_params, quantize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--versions",
                    default="v5,v5bb2,v5i4,w4,w4i4,v5mq8,v5mqi48,w4mq8,"
                            "w4mqi48,v3,v6,v7")
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--l", type=int, default=4,
                    help="layer count (grid dim only; 4 compiles fast)")
    ap.add_argument("--s", type=int, default=2208)
    args = ap.parse_args()

    from umgen_tpu.ops import decode_kernel as dk

    L, d, H, Dh, S, B = args.l, 768, 16, 48, args.s, args.b
    HD = H * Dh
    params = quantize(make_params(L, d, 0))
    params_raw = make_params(L, d, 0)

    x = jnp.zeros((B, 1, d), jnp.bfloat16)
    cl = jnp.asarray(S - 8, jnp.int32)
    flat = (L, B, S, HD)
    kk8 = jax.ShapeDtypeStruct(flat, jnp.int8)
    kk8_5d = jax.ShapeDtypeStruct((L, B, S, H, Dh), jnp.int8)
    kk4 = jax.ShapeDtypeStruct((L, B, S, HD // 2), jnp.int8)
    sc4 = jax.ShapeDtypeStruct((L, B, S, H), jnp.float32)
    x_s = jax.ShapeDtypeStruct(x.shape, x.dtype)

    failures = 0
    for v in args.versions.split(","):
        mq = 0
        i4 = False
        if v == "v3":
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v3
        elif v == "v5":
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v5
        elif v.startswith("v5bb"):
            packed = dk.pack_fused_oar(params)
            fn = functools.partial(dk.fused_decode_step_v5,
                                   batch_block=int(v[4:]))
        elif v == "v6":
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v6
        elif v == "v7":
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v7
        elif v.startswith("v5mqi4"):
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v5mqi4
            mq, i4 = int(v[6:]), True
        elif v.startswith("v5mq"):
            packed, fn = dk.pack_fused_oar(params), dk.fused_decode_step_v5mq
            mq = int(v[4:])
        elif v.startswith("v5i4"):
            packed = dk.pack_fused_oar(params)
            tail = v[6:] if v.startswith("v5i4bb") else ""
            fn = functools.partial(dk.fused_decode_step_v5i4,
                                   batch_block=int(tail) if tail else 0)
            i4 = True
        elif v.startswith("w4mqi4"):
            packed = dk.pack_fused_oar_w4(params_raw)
            fn = dk.fused_decode_step_w4mqi4
            mq, i4 = int(v[6:]), True
        elif v.startswith("w4mq"):
            packed = dk.pack_fused_oar_w4(params_raw)
            fn = dk.fused_decode_step_w4mq
            mq = int(v[4:])
        elif v.startswith("w4i4"):
            packed = dk.pack_fused_oar_w4(params_raw)
            tail = v[6:] if v.startswith("w4i4bb") else ""
            fn = functools.partial(dk.fused_decode_step_w4i4,
                                   batch_block=int(tail) if tail else 0)
            i4 = True
        elif v.startswith("w4"):
            packed = dk.pack_fused_oar_w4(params_raw)
            bb = int(v[4:]) if v.startswith("w4bb") else 0
            fn = functools.partial(dk.fused_decode_step_w4, batch_block=bb)
        else:
            print(f"{v}: unknown, skipped")
            continue

        xq = (jax.ShapeDtypeStruct((B, mq, d), x.dtype) if mq else x_s)
        try:
            if i4:
                jax.jit(functools.partial(fn, n_head=H)).lower(
                    packed, xq, kk4, kk4, sc4, sc4, cl).compile()
            else:
                kv = kk8_5d if v == "v3" else kk8
                jax.jit(functools.partial(fn, n_head=H)).lower(
                    packed, xq, kv, kv, cl).compile()
            print(f"{v}: OK")
        except Exception as e:
            failures += 1
            msg = str(e).split("\n")
            keep = [ln for ln in msg if ("Mosaic" in ln or "MLIR" in ln
                                         or "implemented" in ln
                                         or "vector" in ln.lower()
                                         or "reshape" in ln)][:6]
            print(f"{v}: FAILED {type(e).__name__}")
            print("    " + "\n    ".join(keep or msg[:4]))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
