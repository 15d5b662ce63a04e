"""Incremental compute ablation for the v3 fused decode kernel.

Starts from the stream-only pipeline (measured ~600 GB/s) and adds v3's
per-S-block attention compute piece by piece to find what serializes:

  none      — stream-only baseline
  logits    — int8 MXU logits dot  k[bs,HD] @ qpool[HD,H]
  softmax   — + flash (m, den) bookkeeping on [bs, H]
  value     — + dim-0-contraction value dot + poolt mask-reduce
  qdot      — + the ns==0 / ns==NS-1 weight matmuls (qkv, proj, fc, pj)

Usage: python scripts/probe_compute.py [--b 1,2] [--steps 64]
"""

import argparse
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

L, D, H, Dh, S = 36, 768, 16, 48, 2208
HD = H * Dh
V = 11520


def _pool(H, Dh):
    M = np.zeros((H * Dh, H), np.float32)
    for h in range(H):
        M[h * Dh:(h + 1) * Dh, h] = 1.0
    return M


def probe(B, bs, level, n_steps, reps):
    NS = S // bs
    scale = 1.0 / math.sqrt(Dh)

    lag = lambda k: min(k, NS - 1)  # noqa: E731

    def lagged(shape, lag_ns):
        return pl.BlockSpec(
            (1,) + shape,
            lambda l, ns, *_, _lag=lag_ns: (
                jnp.maximum(l - (ns < _lag), 0),) + (0,) * len(shape))

    def kv_spec():
        return pl.BlockSpec((1, B, bs, HD), lambda l, ns, *_: (l, 0, ns, 0))

    specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),                  # seed [B, D]
        pl.BlockSpec((1, 1, V), lambda l, ns, *_: (l, 0, 0)),   # vec
        pl.BlockSpec((1, D, 4 * D), lambda l, ns, *_: (l, 0, 0)),  # wqp
        lagged((D, 4 * D), lag(2)),                             # wfc
        lagged((4 * D, D), lag(1)),                             # wpj
        kv_spec(), kv_spec(),
        pl.BlockSpec(memory_space=pltpu.VMEM),                  # pool
        pl.BlockSpec(memory_space=pltpu.VMEM),                  # poolt
    ]
    args = [
        jnp.ones((L, 1, V), jnp.float32),
        jnp.ones((L, D, 4 * D), jnp.int8),
        jnp.ones((L, D, 4 * D), jnp.int8),
        jnp.ones((L, 4 * D, D), jnp.int8),
        jnp.ones((L, B, S, HD), jnp.int8),
        jnp.ones((L, B, S, HD), jnp.int8),
        jnp.asarray(_pool(H, Dh)),
        jnp.asarray(_pool(H, Dh).T.copy()),
    ]
    nbytes = L * (4 * V + 3 * D * 4 * D + 2 * B * S * HD)

    def qdot(v, w_blk, ws):
        sa = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0 + 1e-12
        aq = jnp.clip(jnp.round(v / sa), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(aq, w_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * sa * ws[None, :].astype(jnp.float32)

    def kernel(x_ref, vec_ref, wqp_ref, wfc_ref, wpj_ref, kvk_ref, kvv_ref,
               pool_ref, poolt_ref, out_ref,
               h_scr, qp_scr, m_scr, den_scr, acc_scr):
        l = pl.program_id(0)
        ns = pl.program_id(1)
        pool = pool_ref[:]
        poolt = poolt_ref[:]

        @pl.when((l == 0) & (ns == 0))
        def _():
            h_scr[:] = x_ref[:].astype(jnp.float32)
            for b in range(B):
                qp_scr[b * HD:(b + 1) * HD, :H] = pool * (b + 1.0)
            m_scr[:, :H] = jnp.zeros((B, H), jnp.float32)
            den_scr[:, :] = jnp.ones((B, 128), jnp.float32)
            acc_scr[:] = jnp.zeros((B, HD), jnp.float32)

        if level >= 4:
            @pl.when(ns == 0)
            def _():
                h = h_scr[:]
                qkv = qdot(h, wqp_ref[0, :, :3 * D],
                           vec_ref[0, 0, :3 * D])
                q = qkv[:, :HD]
                for b in range(B):
                    qp = q[b][:, None] * pool
                    sq = jnp.max(jnp.abs(qp)) / 127.0 + 1e-12
                    qp_scr[b * HD:(b + 1) * HD, :H] = jnp.clip(
                        jnp.round(qp / sq), -127, 127)
                    den_scr[b:b + 1, 120:121] = sq[None, None]

        if level >= 1:
            @pl.when(ns < NS)
            def _():
                for b in range(B):
                    kmat = kvk_ref[0, b]
                    qp_i8 = qp_scr[b * HD:(b + 1) * HD, :H].astype(jnp.int8)
                    li = jax.lax.dot_general(
                        kmat, qp_i8, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    logits = li.astype(jnp.float32) * scale   # [bs, H]
                    if level >= 2:
                        m_old = m_scr[b:b + 1, :H]
                        m_new = jnp.maximum(
                            m_old, jnp.max(logits, axis=0, keepdims=True))
                        corr = jnp.exp(m_old - m_new)
                        p = jnp.exp(logits - m_new)
                        den = den_scr[b:b + 1, :H] * corr \
                            + jnp.sum(p, axis=0, keepdims=True)
                        m_scr[b:b + 1, :H] = m_new
                        den_scr[b:b + 1, :H] = den
                    else:
                        p = logits
                    if level >= 3:
                        vmat = kvv_ref[0, b]
                        part = jax.lax.dot_general(
                            p.astype(jnp.bfloat16),
                            (vmat.astype(jnp.bfloat16) * (1.0 / 16.0)
                             ).astype(jnp.bfloat16),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [H, HD]
                        blk_mix = jnp.sum(part * poolt, axis=0,
                                          keepdims=True)
                        corr_lanes = jnp.sum(
                            (den_scr[b:b + 1, :H])[0][:, None] * poolt,
                            axis=0, keepdims=True)
                        acc_scr[b:b + 1, :] = (acc_scr[b:b + 1, :]
                                               * corr_lanes + blk_mix)
                    elif level >= 2:
                        acc_scr[b:b + 1, :] = acc_scr[b:b + 1, :] \
                            + jnp.sum(p, axis=0)[None, :HD // H * 1] \
                            * jnp.ones((1, HD), jnp.float32)

        if level >= 4:
            @pl.when(ns == NS - 1)
            def _():
                h = h_scr[:]
                y = qdot(acc_scr[:], wqp_ref[0, :, 3 * D:],
                         vec_ref[0, 0, 3 * D:4 * D])
                h = h + y
                hid = qdot(h, wfc_ref[0], vec_ref[0, 0, :4 * D])
                y2 = qdot(hid, wpj_ref[0], vec_ref[0, 0, :D])
                h_scr[:] = h + y2

        @pl.when((l == L - 1) & (ns == NS - 1))
        def _():
            out_ref[:] = h_scr[:] + acc_scr[:, :D] \
                + m_scr[:1, :1] + den_scr[:1, :1]

    f = pl.pallas_call(
        kernel,
        grid=(L, NS),
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((B * HD, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.VMEM((B, HD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def many(x, *args):
        def body(c, _):
            return f(c, *args), ()

        c, _ = jax.lax.scan(body, x, None, length=n_steps)
        return c

    x0 = jnp.zeros((B, D), jnp.float32)
    np.asarray(many(x0, *args))
    np.asarray(many(x0, *args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = many(x0, *args)
    np.asarray(r)
    dt = (time.perf_counter() - t0) / reps / n_steps
    return dt, nbytes / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="1,2")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", default="0,1,2,3,4")
    args = ap.parse_args()
    names = {0: "stream-only", 1: "+logits dot", 2: "+softmax",
             3: "+value dot", 4: "+weight qdots"}
    for B in [int(x) for x in args.b.split(",")]:
        for lv in [int(x) for x in args.levels.split(",")]:
            try:
                dt, gbps = probe(B, 552, lv, args.steps, args.reps)
                print(f"B={B} L{lv} {names[lv]:14s}: {dt*1e3:7.3f} ms/step"
                      f"  ({gbps:5.1f} GB/s equiv)")
            except Exception as e:  # noqa: BLE001
                msg = str(e).split("\n")[0][:160]
                print(f"B={B} L{lv} {names[lv]:14s}: FAILED "
                      f"{type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
