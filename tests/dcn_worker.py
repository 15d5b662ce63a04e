"""Worker for the two-process DCN smoke test (test_dcn.py).

Each process owns 4 virtual CPU devices; jax.distributed.initialize wires
them into one 8-device global mesh over the loopback "DCN".  Mirrors what
``evaluate.py --launcher`` does on a real multi-host pod
(ref:projects/tools/evaluate.py:126-131 — a dead flag there; live here).

Usage:  python tests/dcn_worker.py <coordinator> <n_procs> <proc_id>
Prints "DCN_OK <psum> <dp_tokens_checksum>" on success.
"""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""      # never dial the TPU relay
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == 4 * n_procs
    assert len(jax.local_devices()) == 4

    import numpy as np

    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mhu
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from umgen_tpu.config import ModelConfig
    from umgen_tpu.data.synthetic import make_token_batch
    from umgen_tpu.models.rollout import Rollout
    from umgen_tpu.models.umgen import UMGen

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    # 1. a cross-process psum over the global 8-device mesh
    local = jnp.arange(4 * pid, 4 * (pid + 1), dtype=jnp.float32)
    xs = mhu.host_local_array_to_global_array(local, mesh, P("dp"))
    with mesh:
        total = jax.jit(shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), "dp"),
            mesh=mesh, in_specs=P("dp"), out_specs=P()))(xs)
    psum_val = float(np.asarray(total.addressable_data(0)))

    # 2. a dp-sharded rollout prefill: global batch 8, 4 scenes per host
    cfg = ModelConfig(tar_mode="temporal_cache", dtype="float32",
                      param_dtype="float32", use_pallas_attention=False,
                      rule_constrain=False, tar_cache_dtype="float32"
                      ).scaled("tiny")
    model = UMGen(cfg)
    ro = Rollout(model)
    params = model.init_params(jax.random.PRNGKey(0))
    # every process builds the same GLOBAL batch, contributes its half
    raw = make_token_batch(model.layout, T=2, B=8, seed=0, config=cfg)
    local_rows = slice(4 * pid, 4 * (pid + 1))
    inputs = {k: mhu.host_local_array_to_global_array(
        jnp.asarray(v[local_rows]), mesh, P("dp")) for k, v in raw.items()}
    params = mhu.host_local_array_to_global_array(params, mesh, P())
    with mesh:
        out, cache = jax.jit(ro.frame_step_prefill)(
            params, inputs, jax.random.PRNGKey(1))
    tokens = mhu.process_allgather(out.tokens, tiled=True)  # [8, len] np
    checksum = int(np.asarray(tokens).astype("int64").sum())

    print(f"DCN_OK {psum_val:.0f} {checksum}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
