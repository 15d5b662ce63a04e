"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.config import ModelConfig
from umgen_tpu.data.synthetic import make_token_batch
from umgen_tpu.models.generate import Generator
from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen
from umgen_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    cfg = ModelConfig(dtype="float32", param_dtype="float32",
                      sample_method="greedy", use_pallas_attention=False,
                      rule_constrain=False, merge_ar_tar=False
                      ).scaled("tiny")
    model = UMGen(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def test_param_specs_divide_shapes(setup):
    cfg, model, params = setup
    mesh = make_mesh(dp=4, tp=2)
    shardings = param_sharding(params, mesh)

    def check(path, arr, sh):
        spec = sh.spec
        for dim, axis in enumerate(spec):
            if axis == "tp":
                assert arr.shape[dim] % 2 == 0, (path, arr.shape, spec)

    from umgen_tpu.parallel.mesh import _tree_paths
    flat_p = dict(_tree_paths(params))
    flat_s = dict(_tree_paths(shardings))
    # qkv column-parallel, proj row-parallel
    assert flat_s["oar/attn/qkv/w"].spec[-1] == "tp"
    assert flat_s["oar/attn/proj/w"].spec[-2] == "tp"
    assert flat_s["head_ar_map/w"].spec[-1] == "tp"
    for path, arr in flat_p.items():
        check(path, arr, flat_s[path])


def test_sharded_frame_step_matches_unsharded(setup):
    """The whole inference frame step under dp=2, tp=2: GSPMD must insert
    the collectives and reproduce the single-device result exactly (greedy,
    fp32)."""
    cfg, model, params = setup
    ro = Rollout(model)
    raw = make_token_batch(model.layout, T=2, B=2, seed=0, config=cfg)
    inputs = {k: jnp.asarray(v) for k, v in raw.items()}
    rng = jax.random.PRNGKey(5)

    ref = jax.jit(ro.frame_step)(params, inputs, rng)
    ref_tokens = np.asarray(ref.tokens)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        sb = shard_batch(inputs, mesh)
        out = jax.jit(ro.frame_step)(sp, sb, rng)
        got = np.asarray(out.tokens)

    agree = (got == ref_tokens).mean()
    # greedy argmax can tie-break differently under resharded reductions;
    # demand near-exact agreement
    assert agree >= 0.995, agree


def test_generator_with_sharded_params(setup):
    cfg, model, params = setup
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        gen = Generator(model, sp, seed=0)
        cond = make_token_batch(model.layout, T=2, B=1, seed=1, config=cfg)
        out = gen.generate(cond, new_frames=1, cond_frames=2)
    assert out["pose"].shape == (1, 3, 3)


@pytest.mark.slow
def test_cached_rollout_sharded_matches_unsharded(setup):
    """Temporal-cache rollout under a dp=2/tp=2 mesh: the TAR rings carry
    explicit dp/tp sharding constraints (Generator(mesh=...)) and the
    token stream must match the single-device run (greedy, fp32).

    slow: ~130 s on the 1-core host (4-virtual-device SPMD execution is
    serial); the gspmd path stays covered in the fast tier by
    test_sharded_frame_step_matches_unsharded +
    test_generator_with_sharded_params, and the serving (shard_map)
    rollout by test_shard_map_dp_rollout_matches_unsharded[True]."""
    cfg, model, params = setup
    from dataclasses import replace
    cfg_c = replace(cfg, tar_mode="temporal_cache")
    model_c = UMGen(cfg_c)

    cond = make_token_batch(model_c.layout, T=3, B=2, seed=2, config=cfg_c)
    ref = Generator(model_c, params, seed=0).generate(
        cond, new_frames=2, cond_frames=3, input_cond_frames=3)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, mesh)
        gen = Generator(model_c, sp, seed=0, mesh=mesh)
        out = gen.generate(cond, new_frames=2, cond_frames=3,
                           input_cond_frames=3)
    for m in model_c.layout.mod_order:
        agree = (out[m][:, 3:] == ref[m][:, 3:]).mean()
        assert agree >= 0.995, (m, agree)


@pytest.mark.slow          # 67 s on the 1-core host; fast-tier dp
@pytest.mark.parametrize("chunked", [  # coverage: test_sharded_frame_step
    pytest.param(False, marks=pytest.mark.slow),   # chunked=True covers
    True])                                         # the same program path
def test_shard_map_dp_rollout_matches_unsharded(setup, chunked):
    """spmd="shard_map" serving: the cached rollout under an explicit
    dp=2 per-device program (the only way the fused Pallas kernels scale
    out) must reproduce the single-device greedy stream."""
    cfg, model, params = setup
    from dataclasses import replace
    cfg_c = replace(cfg, tar_mode="temporal_cache",
                    chunked_prefill=chunked)
    model_c = UMGen(cfg_c)

    cond = make_token_batch(model_c.layout, T=3, B=4, seed=4, config=cfg_c)
    ref = Generator(model_c, params, seed=0).generate(
        cond, new_frames=2, cond_frames=3, input_cond_frames=3)

    mesh = make_mesh(dp=2, tp=1)
    with mesh:
        gen = Generator(model_c, params, seed=0, mesh=mesh,
                        spmd="shard_map")
        out = gen.generate(cond, new_frames=2, cond_frames=3,
                           input_cond_frames=3)
    for m in model_c.layout.mod_order:
        agree = (out[m][:, 3:] == ref[m][:, 3:]).mean()
        assert agree >= 0.995, (m, agree)


@pytest.mark.slow
def test_shard_map_dp8_full_mesh(setup):
    """dp=8 — the full virtual mesh width, one scene per device.  Backs the
    multi-chip serving design note (PERFORMANCE.md roadmap item 5): dp over
    scenes is the throughput-optimal scale-out; the per-device shard_map
    program must stay correct at every mesh width, not just dp=2."""
    cfg, model, params = setup
    from dataclasses import replace
    cfg_c = replace(cfg, tar_mode="temporal_cache")
    model_c = UMGen(cfg_c)

    cond = make_token_batch(model_c.layout, T=3, B=8, seed=6, config=cfg_c)
    ref = Generator(model_c, params, seed=0).generate(
        cond, new_frames=2, cond_frames=3, input_cond_frames=3)

    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        gen = Generator(model_c, params, seed=0, mesh=mesh,
                        spmd="shard_map")
        out = gen.generate(cond, new_frames=2, cond_frames=3,
                           input_cond_frames=3)
    for m in model_c.layout.mod_order:
        agree = (out[m][:, 3:] == ref[m][:, 3:]).mean()
        assert agree >= 0.995, (m, agree)


def test_shard_map_guards(setup):
    cfg, model, params = setup
    from dataclasses import replace
    mesh = make_mesh(dp=2, tp=2)
    with pytest.raises(ValueError, match="tp=1"):
        Generator(UMGen(replace(cfg, tar_mode="temporal_cache")), params,
                  mesh=mesh, spmd="shard_map")
    with pytest.raises(ValueError, match="temporal_cache"):
        Generator(model, params, mesh=make_mesh(dp=2, tp=1),
                  spmd="shard_map")
    with pytest.raises(ValueError, match="mesh"):
        Generator(model, params, spmd="shard_map")


@pytest.mark.slow          # 36 s on the 1-core host; the dp-sharded fast
def test_shard_map_forced_streams_dp2(setup):   # path stays covered by
    """init_token_mod replay through the shard_map dp path (VERDICT r2
    task 6): forced modalities are per-scene token streams sharded over
    dp like any other input; the forced frames must be byte-equal to GT
    on every scene shard."""
    cfg, model, params = setup
    from dataclasses import replace
    cfg_c = replace(cfg, tar_mode="temporal_cache")
    model_c = UMGen(cfg_c)

    cond = make_token_batch(model_c.layout, T=5, B=4, seed=9, config=cfg_c)
    forced = {"map": cond["map"][:, 3:5]}
    mesh = make_mesh(dp=2, tp=1)
    with mesh:
        gen = Generator(model_c, params, seed=0, mesh=mesh,
                        spmd="shard_map")
        out = gen.generate(cond, new_frames=2, cond_frames=3,
                           input_cond_frames=3, forced_streams=forced)
    np.testing.assert_array_equal(out["map"][:, 3:5], cond["map"][:, 3:5])
    # un-forced modalities are sampled, not copied
    assert not np.array_equal(out["image"][:, 3:5], cond["image"][:, 3:5])
