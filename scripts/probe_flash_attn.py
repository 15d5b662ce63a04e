"""Measure the flash-attention kernel vs the XLA sdpa oracle at the
model's hot shapes, on chip.

Round 3 rewrote the kernel with Dh-on-sublanes operands (dim-0
contraction), removing the 48 -> 128 lane padding (2.67x wasted MXU work
and HBM traffic).  This probe rechecks (a) the kernel's achieved TF/s at
the TAR spatial shapes and (b) the XLA-vs-Pallas crossover behind
ops/attention._PALLAS_MIN_SK (dispatch is now a pure Sk threshold:
Pallas for every Sk >= _PALLAS_MIN_SK).

Scan-timed (>= 64 iterations) per PERFORMANCE.md measurement hygiene.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from umgen_tpu.models.modules import sdpa
    from umgen_tpu.ops.flash_attention import flash_attention

    H, Dh = 16, 48
    S = 2208
    shapes = [
        ("cached cascade B=2 (rows=2)", 2, S, S),
        ("cached cascade B=8 (rows=8)", 8, S, S),
        ("recompute cascade B=2 (rows=40)", 40, S, S),
        ("recompute cascade B=4 (rows=80)", 80, S, S),
    ]
    rng = np.random.default_rng(0)

    def scan_time(fn, q, k, v, iters=64):
        # k/v must be explicit jit ARGUMENTS: closed-over arrays embed as
        # program constants and the compile upload trips the relay's
        # request-size limit (HTTP 413) at rows >= 40
        def g_(q0, k_, v_):
            def body(c, _):
                o = fn(c, k_, v_)
                return (c + 0 * o.astype(c.dtype), None)
            return jax.lax.scan(body, q0, None, length=iters)[0]

        g = jax.jit(g_)
        out = g(q, k, v)
        np.asarray(out[0, 0, 0])            # compile + warm
        t0 = time.perf_counter()
        out = g(q, k, v)
        np.asarray(out[0, 0, 0])
        return (time.perf_counter() - t0) / iters

    for name, rows, Sq, Sk in shapes:
        # generate on device — large host literals exceed the axon
        # relay's request-size limit (HTTP 413 at rows=40)
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(rows), 3)
        q = jax.random.normal(kq, (rows, Sq, H, Dh), jnp.bfloat16)
        k = jax.random.normal(kk, (rows, Sk, H, Dh), jnp.bfloat16)
        v = jax.random.normal(kv, (rows, Sk, H, Dh), jnp.bfloat16)
        flops = 4 * rows * H * Sq * Sk * Dh
        t_fl = scan_time(lambda q_, k_, v_: flash_attention(
            q_, k_, v_, causal=False), q, k, v)
        line = (f"{name}: pallas {t_fl * 1e3:.2f} ms "
                f"({flops / t_fl / 1e12:.1f} TF/s)")
        logits_gb = rows * H * Sq * Sk * 4 / 1e9
        if logits_gb < 4.0:                 # XLA materializes the logits
            t_x = scan_time(lambda q_, k_, v_: sdpa(q_, k_, v_, False),
                            q, k, v)
            line += (f"; xla {t_x * 1e3:.2f} ms "
                     f"({flops / t_x / 1e12:.1f} TF/s)")
        else:
            line += f"; xla skipped ({logits_gb:.0f} GB logits)"
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
