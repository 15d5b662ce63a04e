"""Ablate pieces of the real v5 kernel to find the non-overlapped compute.

Copies fused_decode_step_v5 with strip-flags; measures per-step time on
the flat int8 cache at the flagship shape.

    python scripts/probe_v5_ablate.py --b 1,2
"""

import argparse
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umgen_tpu.ops.decode_kernel import (KV_INT8_SCALE, _gelu_exact,
                                         _head_pool_matrix, _vec_offsets,
                                         pack_fused_oar)
from scripts.bench_decode_kernel import make_params, quantize  # noqa: E402

L, D, H, Dh, S = 36, 768, 16, 48, 2208
HD = H * Dh


def build(B, bs, *, no_out=False, no_mask=False, no_ln=False,
          no_attn=False, no_mlp=False, no_qkv=False):
    NS = S // bs
    scale = 1.0 / math.sqrt(Dh)
    off = _vec_offsets(D)

    def kernel(x_ref, cl_ref, vec_ref, wqp_ref, wfc_ref, wpj_ref,
               kvk_ref, kvv_ref, pool_ref, poolt_ref,
               h_out_ref, kvnew_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr):
        l = pl.program_id(0)
        ns = pl.program_id(1)
        cl = cl_ref[0]

        def vec_slice(name):
            a, b = off[name]
            return vec_ref[0, 0, a:b]

        def layer_norm(v, w):
            if no_ln:
                return v
            mu = jnp.mean(v, axis=-1, keepdims=True)
            var = jnp.mean((v - mu) ** 2, axis=-1, keepdims=True)
            return (v - mu) * jax.lax.rsqrt(var + 1e-5) \
                * w.astype(jnp.float32)

        def qdot(v, w_blk, ws, b=None):
            sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
            aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sa \
                * ws[None, :].astype(jnp.float32)
            if b is not None:
                y = y + b[None, :].astype(jnp.float32)
            return y

        pool = pool_ref[:]
        poolt = poolt_ref[:]

        @pl.when(ns == 0)
        def _():
            @pl.when(l == 0)
            def _():
                h_scr[:] = x_ref[:].astype(jnp.float32)
            h = h_scr[:]
            if not no_qkv:
                a = layer_norm(h, vec_slice("ln1"))
                qkv = qdot(a, wqp_ref[0, :, :3 * D], vec_slice("qkv_ws"),
                           vec_slice("qkv_b"))
                q = qkv[:, :HD]
                k_new = qkv[:, HD:2 * HD]
                v_new = qkv[:, 2 * HD:]
            else:
                q = h[:, :HD]
                k_new = h[:, :HD]
                v_new = h[:, :HD]
            if not no_out:
                kvnew_ref[0, :, :HD] = k_new.astype(kvnew_ref.dtype)
                kvnew_ref[0, :, HD:] = v_new.astype(kvnew_ref.dtype)
            for b in range(B):
                qp = q[b][:, None] * pool
                sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
                qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                    jnp.round(qp / sq), -127, 127)
                den_scr[b:b + 1, 120:121] = sq[None, None]
            sl_all = jax.lax.dot_general(
                (k_new * q).astype(jnp.float32), pool,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m_scr[:, :H] = sl_all
            den_scr[:, :H] = jnp.ones_like(sl_all)
            acc_scr[:] = v_new

        if not no_attn:
            base = ns * bs
            spos = base + jax.lax.broadcasted_iota(jnp.int32, (bs, H), 0)
            valid = spos < cl
            for b in range(B):
                kmat = kvk_ref[0, b]
                vmat = kvv_ref[0, b]
                qp_i8 = qp_scr[b * HD:(b + 1) * HD, :H].astype(jnp.int8)
                sq = den_scr[b, 120]
                li = jax.lax.dot_general(kmat, qp_i8,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                logits = (li.astype(jnp.float32)
                          * (sq * scale / KV_INT8_SCALE))
                if not no_mask:
                    logits = jnp.where(valid, logits, -jnp.inf)
                m_old = m_scr[b:b + 1, :H]
                m_new = jnp.maximum(m_old, jnp.max(logits, axis=0,
                                                   keepdims=True))
                corr = jnp.exp(m_old - m_new)
                p = jnp.exp(logits - m_new)
                den = den_scr[b:b + 1, :H] * corr \
                    + jnp.sum(p, axis=0, keepdims=True)
                part = jax.lax.dot_general(
                    p.astype(jnp.bfloat16),
                    (vmat.astype(jnp.bfloat16)
                     * (1.0 / KV_INT8_SCALE)).astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                blk_mix = jnp.sum(part * poolt, axis=0, keepdims=True)
                corr_lanes = jnp.sum(corr[0][:, None] * poolt, axis=0,
                                     keepdims=True)
                acc_scr[b:b + 1, :] = (acc_scr[b:b + 1, :] * corr_lanes
                                       + blk_mix)
                m_scr[b:b + 1, :H] = m_new
                den_scr[b:b + 1, :H] = den

        @pl.when(ns == NS - 1)
        def _():
            h = h_scr[:]
            if not no_mlp:
                den_lanes_rows = []
                for b in range(B):
                    dl = jnp.sum(den_scr[b:b + 1, :H][0][:, None] * poolt,
                                 axis=0, keepdims=True)
                    den_lanes_rows.append(dl)
                den_lanes = jnp.concatenate(den_lanes_rows, axis=0)
                y = acc_scr[:] / den_lanes
                y = qdot(y, wqp_ref[0, :, 3 * D:4 * D],
                         vec_slice("proj_ws"), vec_slice("proj_b"))
                h = (h.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)
                     ).astype(jnp.float32)
                a2 = layer_norm(h, vec_slice("ln2"))
                hid = qdot(a2, wfc_ref[0], vec_slice("fc_ws"))
                hid = _gelu_exact(hid)
                y2 = qdot(hid, wpj_ref[0], vec_slice("pj_ws"))
                h = (h.astype(jnp.bfloat16) + y2.astype(jnp.bfloat16)
                     ).astype(jnp.float32)
            h_scr[:] = h

            @pl.when(l == L - 1)
            def _():
                h_out_ref[:] = h.astype(h_out_ref.dtype)

    def at_l(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, ns: (l,) + (0,) * len(shape))

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, _lag=lag_ns: (jnp.maximum(l - (ns < _lag), 0),)
            + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec((1, B, bs, HD), lambda l, ns: (l, 0, ns, 0))

    lag_pj = 1 if NS > 2 else 0
    lag_fc = 2 if NS > 2 else 0

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def step(packed, x, kvk, kvv, cl):
        pool = jnp.asarray(_head_pool_matrix(H, Dh))
        poolt = pool.T.copy()
        h_out, kvnew = pl.pallas_call(
            kernel,
            grid=(L, NS),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                at_l((1, packed["vec"].shape[-1])),
                at_l((D, 4 * D)),
                lagged((D, 4 * D), lag_fc),
                lagged((4 * D, D), lag_pj),
                kv_spec(), kv_spec(),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, 2 * HD), lambda l, ns: (l, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((L, B, 2 * HD), jnp.bfloat16),
            ],
            scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                            pltpu.VMEM((B * HD, 128), jnp.float32),
                            pltpu.VMEM((B, 128), jnp.float32),
                            pltpu.VMEM((B, 128), jnp.float32),
                            pltpu.VMEM((B, HD), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, cl, packed["vec"], packed["wqp"], packed["wfc"],
          packed["wpj"], kvk, kvv, pool, poolt)
        return h_out, kvk, kvv

    return step


def measure(step, packed, B, n_steps, reps, writeback=False):
    kk = jnp.zeros((L, B, S, HD), jnp.int8)
    vv = jnp.zeros((L, B, S, HD), jnp.int8)
    x = jnp.zeros((B, D), jnp.bfloat16)
    cl = jnp.asarray([S - 8], jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def many(x, kk, vv):
        def body(c, _):
            x, kk, vv = c
            h, kk, vv = step(packed, x, kk, vv, cl)
            if writeback:
                row = jnp.clip(jnp.round(
                    h[:, None, :].astype(jnp.float32) * KV_INT8_SCALE),
                    -127, 127).astype(jnp.int8)
                row = jnp.broadcast_to(row[None, :, :, :HD],
                                       (L, B, 1, HD))
                kk = jax.lax.dynamic_update_slice(
                    kk, row, (0, 0, cl[0], 0))
                vv = jax.lax.dynamic_update_slice(
                    vv, row, (0, 0, cl[0], 0))
            return (h.astype(jnp.bfloat16), kk, vv), ()

        c, _ = jax.lax.scan(body, (x, kk, vv), None, length=n_steps)
        return c

    (h, kk, vv) = many(x, kk, vv)
    np.asarray(h)
    t0 = time.perf_counter()
    for _ in range(reps):
        h, kk, vv = many(h, kk, vv)
    np.asarray(h)
    return (time.perf_counter() - t0) / reps / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="2")
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bs", type=int, default=552)
    args = ap.parse_args()

    params = quantize(make_params(L, D, 0))
    packed = pack_fused_oar(params)

    cases = [
        ("full v5", {}),
        ("no kvnew out", {"no_out": True}),
        ("no masks", {"no_mask": True}),
        ("no layernorm", {"no_ln": True}),
        ("no attention", {"no_attn": True}),
        ("no mlp/final", {"no_mlp": True}),
        ("no qkv dot", {"no_qkv": True}),
        ("stream only", {"no_out": True, "no_mask": True, "no_ln": True,
                         "no_attn": True, "no_mlp": True, "no_qkv": True}),
        ("full + writeback", {"__wb__": True}),
    ]
    for B in [int(x) for x in args.b.split(",")]:
        for name, kw in cases:
            try:
                wb = kw.pop("__wb__", False)
                step = build(B, args.bs, **kw)
                dt = measure(step, packed, B, args.steps, args.reps,
                             writeback=wb)
                print(f"B={B} {name:16s}: {dt*1e3:7.3f} ms/step")
            except Exception as e:  # noqa: BLE001
                print(f"B={B} {name:16s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
