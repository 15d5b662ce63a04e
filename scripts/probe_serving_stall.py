"""Pinpoint why serving-checkpoint runs stall ~600 s before the first
decode step (r4a1/r4a3) while the in-process-quantized path warms up in
~142-213 s.

Separates the candidate stages:
  1. orbax restore wall time + where the leaves actually live
  2. touching the big leaves with a trivial jit (forces any lazy
     transfer / relayout)
  3. AOT lower+compile of frame_step_cached from ShapeDtypeStructs only
     (compile cost with NO data dependence)
  4. first + second execution of the compiled step with the real arrays
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.models.rollout import Rollout
    from umgen_tpu.models.umgen import UMGen
    from umgen_tpu.runtime.checkpoint import load_params

    B = 10
    cfg = ModelConfig(tar_mode="temporal_cache", tar_cache_dtype="int4",
                      chunked_prefill=True, oar_cache_dtype="int8",
                      tar_cache_window=8, tpe_clamp=2, oar_batch_block=5,
                      fused_oar_kernel=True).scaled("larger")
    model = UMGen(cfg)
    ro = Rollout(model)

    mode0 = sys.argv[1] if len(sys.argv) > 1 else "none"
    t0 = time.time()
    tree = load_params("output/large_ckpt/serving", host=mode0 == "hostload")
    params = tree["params"]
    print(f"restore(host={mode0 == 'hostload'}): {time.time() - t0:.0f}s",
          flush=True)
    if mode0 == "hostload":
        t0 = time.time()
        params = jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, params)
        jax.block_until_ready(params)
        print(f"upload: {time.time() - t0:.0f}s", flush=True)

    step_no = tree["step"]
    del tree                    # the old tree must FREE before normalize
    mode = sys.argv[1] if len(sys.argv) > 1 else "none"
    if mode == "jit":
        # one jitted identity over the whole tree: fresh default-layout
        # device outputs in ONE executable launch
        t0 = time.time()
        params = jax.jit(lambda p: jax.tree.map(
            lambda x: x if not hasattr(x, "dtype") else x[...], p),
            donate_argnums=0)(params)
        jax.block_until_ready(params)
        print(f"normalize(jit): {time.time() - t0:.0f}s", flush=True)
    elif mode == "host":
        t0 = time.time()
        params = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)) if hasattr(x, "dtype")
            else x, params)
        jax.block_until_ready(params)
        print(f"normalize(host): {time.time() - t0:.0f}s", flush=True)

    # inspect a few representative leaves
    def show(name, x):
        try:
            dev = list(x.devices())
        except Exception:
            dev = "?"
        print(f"  {name}: {x.dtype} {x.shape} dev={dev} "
              f"committed={getattr(x, '_committed', '?')}", flush=True)

    oar_packed = params.get("oar_packed")
    if isinstance(oar_packed, dict):
        for k, v in list(oar_packed.items())[:3]:
            if hasattr(v, "dtype"):
                show(f"oar_packed.{k}", v)
    show("tpe", params["tpe"])

    t0 = time.time()
    s = sum(jnp.sum(jnp.asarray(x, jnp.float32)) for x in
            jax.tree.leaves(params) if hasattr(x, "dtype"))
    jax.block_until_ready(s)
    print(f"touch-all jit sum: {time.time() - t0:.0f}s", flush=True)

    # build call args
    T = 20
    raw = make_token_batch(model.layout, T=1, B=B, seed=0, config=cfg)
    newest = {m: jnp.asarray(v) for m, v in raw.items()}
    cache = jax.jit(lambda: model.init_tar_cache(B))()
    cache["frames"] = jnp.asarray(T, jnp.int32)
    rng = jax.random.PRNGKey(0)

    step = jax.jit(ro.frame_step_cached, donate_argnums=(2,))
    t0 = time.time()
    lowered = step.lower(params, newest, cache, rng)
    print(f"lower (trace): {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile (AOT): {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    out, cache = compiled(params, newest, cache, rng)
    tok = np.asarray(out.tokens)
    print(f"exec 1: {time.time() - t0:.0f}s", flush=True)
    sl = model.layout.slices()
    newest = {m: jnp.asarray(tok[:, sl[m]][:, None])
              for m in model.layout.mod_order}
    t0 = time.time()
    out, cache = compiled(params, newest, cache, rng)
    np.asarray(out.tokens)
    print(f"exec 2: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
