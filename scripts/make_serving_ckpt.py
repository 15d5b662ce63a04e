"""Pre-quantize the trained 2.4B train-state into a serving checkpoint.

Round-3 post-mortem (VERDICT.md r3 weak #1): `python bench.py` spent
~11 minutes of its 16.5-minute wall on serving-state *preparation* —
random-initialising 2.4B f32 params on device, orbax-restoring the
3.5 GB train state, then quantizing on the HOST (numpy) which round-trips
4.8 GB of bf16 weights down the axon relay and 2.4 GB of int8 back up.
The driver's bench budget killed it (BENCH_r03 rc=124).

This script does all of that ONCE, offline, on CPU:

  train state (output/large_ckpt/final, 3.5 GB)
    → quantize_params_int8(ALL_STACK_KEYS)      # int8 everywhere
    → pack_fused_w4(raw oar)                    # W4A8 fused-kernel blocks
    → output/large_ckpt/serving (+ meta.json)   # ~2.6 GB, load-and-go

bench.py then restores the serving tree straight to the TPU — no init,
no quantization, ~40% fewer upload bytes.  serving_meta.json records the
quantization config so bench.py only uses the artifact when its env-knob
config matches (otherwise it falls back to the raw train state).

Run on CPU (quantization is numpy/host-side anyway):
    JAX_PLATFORMS=cpu python scripts/make_serving_ckpt.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "output", "large_ckpt", "final")
DST = os.path.join(REPO, "output", "large_ckpt", "serving")

# the bench-default serving quantization (bench.py defaults as of r4)
META = {
    "scale": "larger",
    "w8_mode": "all",
    "w4": True,
    "fused": True,
    "oar_kv": "int8",
}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--dst", default=DST)
    ap.add_argument("--scale", default=META["scale"])
    ap.add_argument("--fused", type=int, default=1,
                    help="pack for the fused decode kernel (requires "
                         "n_embd >= 128; 0 = plain int8 tree, what the "
                         "XLA fallback path serves)")
    ap.add_argument("--w4", type=int, default=1,
                    help="group-128 int4 OAR weights (fused only)")
    ap.add_argument("--tar_w4", type=int, default=0,
                    help="group-128 int4 TAR-family weights served by the "
                         "XLA dequant path — frees ~1 GB HBM for the "
                         "full-window scene batch (quality: same 4-8% "
                         "per-matmul envelope as the OAR W4)")
    ap.add_argument("--random_init", action="store_true",
                    help="build the artifact from seeded random-init "
                         "params instead of a train state (no --src "
                         "needed).  Throughput benching only — the meta "
                         "records random_init=true and bench.py labels "
                         "the regime honestly.  Exists because bench.py's "
                         "no-artifact startup (2.4B init + on-the-fly "
                         "quantization) measured ~11 min, which blows the "
                         "driver's per-rung budget on a fresh tree.")
    args = ap.parse_args()

    from umgen_tpu.runtime.checkpoint import load_params, save_params
    from umgen_tpu.runtime.quantize import (ALL_STACK_KEYS, pack_fused,
                                            pack_fused_w4,
                                            quantize_params_int8,
                                            quantize_params_w4)

    meta = dict(META, scale=args.scale, fused=bool(args.fused),
                w4=bool(args.fused and args.w4),
                tar_w4=bool(args.tar_w4))
    train_meta = os.path.join(os.path.dirname(args.src), "train_meta.json")
    if not args.random_init and os.path.isfile(train_meta):
        with open(train_meta) as f:
            tm = json.load(f)
        meta["trained_window"] = tm.get("window")
        meta["temporal_pe"] = tm.get("temporal_pe", "absolute")

    t0 = time.time()
    if args.random_init:
        import jax
        from umgen_tpu.config import ModelConfig
        from umgen_tpu.models.umgen import UMGen
        meta["random_init"] = True
        print("random-init params (seed 0) ...", flush=True)
        cfg = ModelConfig(param_dtype="bfloat16").scaled(args.scale)
        tree = {"params": UMGen(cfg).init_params(jax.random.PRNGKey(0)),
                "step": 0}
        step = 0
        print(f"  initialized in {time.time() - t0:.0f}s", flush=True)
    else:
        print(f"restoring {args.src} ...", flush=True)
        # host=True: a TPU-saved train state restored in this CPU process
        # needs no device shardings (and quantization is numpy anyway) —
        # without it orbax raises "sharding ... should be specified" on
        # cross-backend restores
        tree = load_params(args.src, host=True)
        step = int(__import__("numpy").asarray(tree["step"]))
        print(f"  restored step {step} in {time.time() - t0:.0f}s",
              flush=True)

    params = dict(tree["params"])
    buffers = tree.get("buffers") or params.get("buffers")
    raw_oar = params["oar"]

    t1 = time.time()
    params = quantize_params_int8(params, keys=ALL_STACK_KEYS)
    print(f"  int8 quantization in {time.time() - t1:.0f}s", flush=True)

    t1 = time.time()
    if meta["w4"]:
        params = pack_fused_w4(params, raw_oar)
        print(f"  w4 packing in {time.time() - t1:.0f}s", flush=True)
    elif meta["fused"]:
        params = pack_fused(params, META["oar_kv"])
        print(f"  fused packing in {time.time() - t1:.0f}s", flush=True)
    del raw_oar, tree
    if meta["tar_w4"]:
        t1 = time.time()
        params = quantize_params_w4(params)
        print(f"  tar w4 in {time.time() - t1:.0f}s", flush=True)

    params["buffers"] = buffers
    t1 = time.time()
    save_params(args.dst, {"params": params, "step": step})
    with open(args.dst + "_meta.json", "w") as f:
        json.dump(dict(meta, step=step), f)
    print(f"  saved {args.dst} in {time.time() - t1:.0f}s "
          f"(total {time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
