"""Multi-frame scene rollout: the outer generation loop.

Rebuild of ``UMGen.inference`` (ref:projects/models/UMGen.py:1542-1671):
slide a <= cond_frames window over the generated stream and call the jitted
frame step once per frame.  Each distinct window length compiles once and is
cached (video mode always runs at T=20; control mode grows 13→20).

Control semantics (ref:UMGen.py:1606-1658):
  * init pose for frame idx → forced ego action (trajectory control)
  * init bbox3d + control_test → per-object token injection: valid slots
    overwrite the conditioning frame and force TAR-head sampling
  * when the init pose stream runs out, control switches off for the rest
    of the rollout
  * per-frame outputs: controlled modalities append their init values;
    bbox3d under control_test appends the SAMPLED tokens
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from umgen_tpu.models.rollout import Rollout
from umgen_tpu.models.umgen import UMGen

Params = Dict[str, Any]


class Generator:
    def __init__(self, model: UMGen, params: Params, seed: int = 0,
                 donate_kv: bool = True, mesh=None, spmd: str = "gspmd"):
        """mesh: optional `jax.sharding.Mesh` with ("dp", "tp") axes for
        multi-chip rollouts — scenes shard over dp, attention heads and the
        TAR rings over tp.  Pass params already placed via
        `parallel.mesh.shard_params`; raw numpy conditioning is sharded
        here per frame.

        spmd: "gspmd" (default) relies on XLA sharding propagation from
        the mesh annotations — the XLA decode path.  "shard_map" wraps the
        cached frame step in an explicit per-device program with scenes
        split over dp: this is the ONLY way the fused Pallas decode
        kernels scale out (GSPMD cannot partition a custom call — it
        replicates the whole cache per chip), and requires
        tar_mode="temporal_cache", tp == 1 and batch % dp == 0.  Params
        must be fully replicated across the mesh."""
        self.model = model
        self.params = params
        self.rollout = Rollout(model)
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = mesh
        if spmd not in ("gspmd", "shard_map"):
            raise ValueError(f"spmd must be gspmd|shard_map, got {spmd}")
        if spmd == "shard_map":
            if mesh is None:
                raise ValueError("spmd='shard_map' requires a mesh")
            if mesh.shape.get("tp", 1) != 1:
                raise ValueError(
                    "spmd='shard_map' serving is dp-only (the fused "
                    "kernels run whole-head-set per chip); use tp=1")
            if model.config.tar_mode != "temporal_cache":
                raise ValueError(
                    "spmd='shard_map' requires tar_mode='temporal_cache'")
        self.spmd = spmd
        self._step_cache: Dict[Any, Any] = {}
        # cumulative speculative-decode telemetry across generated frames
        # (meaningful when config.speculative_k > 0; see FrameOutputs)
        self.spec_chunks = 0
        self.spec_accepted = 0

    def _constrained(self, fn):
        """Wrap a (outputs, cache)-returning step so the TAR rings keep
        their dp/tp layout inside the compiled program."""
        if self.mesh is None:
            return fn
        from umgen_tpu.parallel.mesh import constrain_rollout_cache

        def wrapped(*args, **kwargs):
            out, cache = fn(*args, **kwargs)
            return out, constrain_rollout_cache(cache, self.mesh)

        return wrapped

    def _constrained_cache(self, fn):
        """Like _constrained but for functions returning only a cache."""
        if self.mesh is None:
            return fn
        from umgen_tpu.parallel.mesh import constrain_rollout_cache

        def wrapped(*args, **kwargs):
            return constrain_rollout_cache(fn(*args, **kwargs), self.mesh)

        return wrapped

    def _place_inputs(self, dev_inputs):
        if self.mesh is None:
            return dev_inputs
        from umgen_tpu.parallel.mesh import shard_batch
        return shard_batch(dev_inputs, self.mesh)

    def _sm_cached_fns(self):
        """shard_map'd cached-mode step functions (explicit dp scene
        split).  The fused Pallas decode kernels are opaque custom calls
        to GSPMD, so multi-chip serving with them needs this per-device
        program: every chip runs the whole fused stack on its own scene
        shard; the only cross-chip traffic is the telemetry psum."""
        fns = self._step_cache.get("sm")
        if fns is None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from umgen_tpu.models.rollout import FrameOutputs

            mesh, ro, model = self.mesh, self.rollout, self.model
            mods = model.layout.mod_order
            cspec = model.tar_cache_pspecs("dp")
            rspec = FrameOutputs(tokens=P("dp"), pose_tokens=P("dp"),
                                 spec_chunks=P(), spec_accepted=P())
            dspec = {m: P("dp") for m in mods}
            sm = functools.partial(shard_map, mesh=mesh, check_vma=False)
            ov_specs = {"": (), "p": (P("dp"),), "pb": (P("dp"), P("dp"))}

            def dp_rng(rng):
                # distinct sampling noise per scene shard — a replicated
                # key would correlate same-local-row scenes across chips
                return jax.random.fold_in(rng, jax.lax.axis_index("dp"))

            def tele(res):
                return res._replace(
                    spec_chunks=jax.lax.psum(res.spec_chunks, "dp"),
                    spec_accepted=jax.lax.psum(res.spec_accepted, "dp"))

            def kw_of(variant, ov):
                kw = {}
                if variant in ("p", "pb"):
                    kw["pose_override"] = ov[0]
                if variant == "pb":
                    kw["control_bbox"] = ov[1]
                return kw

            def make(fn, variant, n_state):
                # n_state: trailing state args before the override args —
                # prefill: (rng,), cached step: (cache, rng).  The last
                # arg is always the forced-tokens dict (init_token_mod
                # replay): per-scene [B, len] streams sharded over dp
                # like every other token input ({} = none; a pytree
                # PREFIX spec broadcasts P("dp") over whatever modality
                # set a frame forces, so jit just specializes per set).
                def body(params, x, *rest):
                    state, ov, fd = (rest[:n_state], rest[n_state:-1],
                                     rest[-1])
                    res, cache = fn(params, x, *state[:-1],
                                    dp_rng(state[-1]),
                                    forced_tokens=fd,
                                    **kw_of(variant, ov))
                    return tele(res), cache

                n_cache = n_state - 1
                in_specs = ((P(), dspec) + (cspec,) * n_cache + (P(),)
                            + ov_specs[variant] + (P("dp"),))
                f = sm(body, in_specs=in_specs, out_specs=(rspec, cspec))
                return jax.jit(f, donate_argnums=(2,) if n_cache else ())

            def ingest_body(params, frame_t, pose_next, cache):
                return ro.ingest_frame(params, frame_t, pose_next, cache)

            ingest = jax.jit(sm(
                ingest_body,
                in_specs=(P(), dspec, P("dp"), cspec),
                out_specs=cspec), donate_argnums=(3,))

            dp = mesh.shape["dp"]

            def cache_init(B0):
                if B0 % dp:
                    raise ValueError(f"batch {B0} must divide dp={dp}")
                return jax.jit(sm(lambda: model.init_tar_cache(B0 // dp),
                                  in_specs=(), out_specs=cspec))()

            fns = {"ingest": ingest, "cache_init": cache_init}
            for v in ("", "p", "pb"):
                fns["prefill" + v] = make(ro.frame_step_prefill, v, 1)
                fns["step" + v] = make(ro.frame_step_cached, v, 2)
            self._step_cache["sm"] = fns
        return fns

    def _step_fn(self, variant: str):
        # every variant takes a trailing forced-tokens dict ({} = none);
        # jax.jit retraces per pytree structure, so a new forced-mod set
        # just compiles one more specialization
        fn = self._step_cache.get(variant)
        if fn is None:
            if variant == "plain":
                fn = jax.jit(lambda p, inp, rng, fd: self.rollout.frame_step(
                    p, inp, rng, forced_tokens=fd))
            elif variant == "pose":
                fn = jax.jit(
                    lambda p, inp, rng, po, fd: self.rollout.frame_step(
                        p, inp, rng, pose_override=po, forced_tokens=fd))
            elif variant == "pose_bbox":
                fn = jax.jit(
                    lambda p, inp, rng, po, cb, fd: self.rollout.frame_step(
                        p, inp, rng, pose_override=po, control_bbox=cb,
                        forced_tokens=fd))
            self._step_cache[variant] = fn
        return fn

    def generate(self,
                 cond_tokens: Dict[str, np.ndarray],
                 new_frames: int,
                 cond_frames: int = 20,
                 input_cond_frames: int = -1,
                 init_tokens: Optional[Dict[str, np.ndarray]] = None,
                 control_test: bool = False,
                 progress: bool = False,
                 forced_streams: Optional[Dict[str, np.ndarray]] = None,
                 ) -> Dict[str, np.ndarray]:
        """cond_tokens: dict mod → [B, T0, len].  Returns dict mod →
        [B, input_cond_frames + new_frames, len] numpy (conditioning prefix
        + generated frames, matching the reference's out_tokens).

        forced_streams: {mod: [B, T_f, len]} — init_token_mod replay
        (ref:model_pl.py:103-130): for generated frame idx < T_f the listed
        modalities are teacher-forced to these tokens (GT) instead of
        sampled; later positions in the frame condition on the forced
        stream.  Frames past T_f sample freely.

        With config.tar_mode == "temporal_cache" the TAR cascade runs
        against per-layer temporal KV rings: the conditioning window is
        ingested once, then each frame pushes only its own tokens through
        the stacks (~12x fewer TAR FLOPs at the larger scale)."""
        if forced_streams and "pose" in forced_streams:
            # forcing the ego action rides the existing trajectory-control
            # path (pose_override)
            init_tokens = dict(init_tokens or {})
            init_tokens.setdefault("pose", forced_streams["pose"])
        if self.model.config.tar_mode == "temporal_cache":
            return self._generate_cached(cond_tokens, new_frames,
                                         input_cond_frames, init_tokens,
                                         control_test, progress,
                                         forced_streams)
        lo = self.model.layout
        mods = lo.mod_order
        if input_cond_frames == -1:
            input_cond_frames = cond_frames

        out = {m: np.asarray(cond_tokens[m][:, :input_cond_frames])
               for m in mods}
        cond = {m: out[m].copy() for m in mods}
        # sanitize init tokens: image may never steer (ref:UMGen.py:1517-1524)
        # — currently supported init modalities: pose (trajectory) and
        # bbox3d (per-object injection)
        init = None
        if init_tokens is not None:
            init = {m: np.asarray(v) for m, v in init_tokens.items()
                    if v is not None and m in ("pose", "bbox3d")}
            if "pose" not in init:
                init = None

        forced = {m: np.asarray(v) for m, v in (forced_streams or {}).items()
                  if m in mods and m != "pose"}

        frames = range(new_frames)
        if progress:
            import tqdm
            frames = tqdm.tqdm(frames, desc="rollout")

        for idx in frames:
            if cond["pose"].shape[1] > cond_frames:
                cond = {m: v[:, -cond_frames:] for m, v in cond.items()}

            fd = {m: jnp.asarray(v[:, idx], jnp.int32)
                  for m, v in forced.items() if idx < v.shape[1]}

            pose_override = None
            control_bbox = None
            frame_control = False
            if init is not None and idx < init["pose"].shape[1]:
                pose_override = jnp.asarray(init["pose"][:, idx],
                                            dtype=jnp.int32)
                if control_test and "bbox3d" in init \
                        and idx < init["bbox3d"].shape[1]:
                    control_bbox = jnp.asarray(init["bbox3d"][:, idx],
                                               dtype=jnp.int32)
                    # the reference's overwrite of the newest window
                    # frame is an in-place mutation that PERSISTS as the
                    # window slides (ref:UMGen.py:1464-1467 writes into
                    # the cond_tokens tensor) — mirror it on the host
                    # copy so frames keep their overrides after leaving
                    # position -1
                    cb = np.asarray(init["bbox3d"][:, idx])
                    valid = cb != -1
                    b3 = cond["bbox3d"].copy()
                    last = b3[:, -1]
                    last[valid] = cb[valid]
                    b3[:, -1] = last
                    cond["bbox3d"] = b3
                frame_control = True
            elif init is not None:
                # init pose exhausted → control off for remaining frames
                # (ref:UMGen.py:1613-1620)
                init = None

            self.rng, step_rng = jax.random.split(self.rng)
            dev_inputs = self._place_inputs(
                {m: jnp.asarray(v, dtype=jnp.int32) for m, v in cond.items()})
            if control_bbox is not None:
                fn = self._step_fn("pose_bbox")
                res = fn(self.params, dev_inputs, step_rng, pose_override,
                         control_bbox, fd)
            elif pose_override is not None:
                fn = self._step_fn("pose")
                res = fn(self.params, dev_inputs, step_rng, pose_override,
                         fd)
            else:
                fn = self._step_fn("plain")
                res = fn(self.params, dev_inputs, step_rng, fd)

            tokens = np.asarray(jax.device_get(res.tokens))
            self.spec_chunks += int(res.spec_chunks)
            self.spec_accepted += int(res.spec_accepted)
            sl = lo.slices()
            frame = {m: tokens[:, sl[m]] for m in mods}

            for m in mods:
                if frame_control and init is not None and m in init \
                        and not (control_test and m == "bbox3d"):
                    new = init[m][:, idx][:, None] if m != "pose" else \
                        np.asarray(pose_override)[:, None]
                    # (pose is the only init mod we force wholesale here)
                    new = np.asarray(new)
                else:
                    new = frame[m][:, None]
                cond[m] = np.concatenate([cond[m], new], axis=1)
                out[m] = np.concatenate([out[m], new], axis=1)

        return out

    # ------------------------------------------------------------------
    def _generate_cached(self, cond_tokens, new_frames, input_cond_frames,
                         init_tokens, control_test, progress,
                         forced_streams=None):
        lo = self.model.layout
        mods = lo.mod_order
        forced = {m: np.asarray(v) for m, v in (forced_streams or {}).items()
                  if m in mods and m != "pose"}
        if input_cond_frames == -1:
            input_cond_frames = self.model.config.cond_frame

        out = {m: np.asarray(cond_tokens[m][:, :input_cond_frames])
               for m in mods}
        init = None
        if init_tokens is not None:
            init = {m: np.asarray(v) for m, v in init_tokens.items()
                    if v is not None and m in ("pose", "bbox3d")}
            if "pose" not in init:
                init = None

        # prefill creates the rings; the steady-state step donates them so
        # input/output copies never coexist (the rings are multi-GB)
        if self.spmd == "shard_map":
            sm = self._sm_cached_fns()

            def call_prefill(p, inp, rng, pose_override=None,
                             control_bbox=None, forced_tokens=None):
                fd = forced_tokens or {}
                if control_bbox is not None:
                    return sm["prefillpb"](p, inp, rng, pose_override,
                                           control_bbox, fd)
                if pose_override is not None:
                    return sm["prefillp"](p, inp, rng, pose_override, fd)
                return sm["prefill"](p, inp, rng, fd)

            def call_step(p, newest, cache, rng, pose_override=None,
                          control_bbox=None, forced_tokens=None):
                fd = forced_tokens or {}
                if control_bbox is not None:
                    return sm["steppb"](p, newest, cache, rng,
                                        pose_override, control_bbox, fd)
                if pose_override is not None:
                    return sm["stepp"](p, newest, cache, rng, pose_override,
                                       fd)
                return sm["step"](p, newest, cache, rng, fd)
        else:
            prefill = jax.jit(
                self._constrained(self.rollout.frame_step_prefill))
            step_jit = jax.jit(
                self._constrained(self.rollout.frame_step_cached),
                donate_argnums=(2,))

            def call_prefill(p, inp, rng, pose_override=None,
                             control_bbox=None, forced_tokens=None):
                return prefill(p, inp, rng, pose_override=pose_override,
                               control_bbox=control_bbox,
                               forced_tokens=forced_tokens)

            def call_step(p, newest, cache, rng, pose_override=None,
                          control_bbox=None, forced_tokens=None):
                return step_jit(p, newest, cache, rng,
                                pose_override=pose_override,
                                control_bbox=control_bbox,
                                forced_tokens=forced_tokens)

        frames = range(new_frames)
        if progress:
            import tqdm
            frames = tqdm.tqdm(frames, desc="rollout(cached)")

        # ring-exactness refresh (config.tar_cache_refresh = N): every N
        # frames rebuild the rings from the last `window` frames with
        # window-relative indices, so the next decode sees exactly the
        # reference's sliding-window recompute semantics.  `hist` mirrors
        # the window frames beneath `newest` on the host (post
        # control-override — the canonical window content).
        import collections
        window = self.model.config.tar_cache_window \
            or self.model.config.cond_frame
        refresh = self.model.config.tar_cache_refresh
        hist = collections.deque(maxlen=max(window - 1, 1))
        pending_h = None                 # host frame awaiting ingestion

        cache = None
        newest = None
        sl = lo.slices()
        for idx in frames:
            pose_override = control_bbox = None
            frame_control = False
            if init is not None and idx < init["pose"].shape[1]:
                pose_override = jnp.asarray(init["pose"][:, idx],
                                            dtype=jnp.int32)
                if control_test and "bbox3d" in init \
                        and idx < init["bbox3d"].shape[1]:
                    control_bbox = jnp.asarray(init["bbox3d"][:, idx],
                                               dtype=jnp.int32)
                frame_control = True
            elif init is not None:
                init = None
            fd = {m: jnp.asarray(v[:, idx], jnp.int32)
                  for m, v in forced.items() if idx < v.shape[1]}

            if control_bbox is not None and pending_h is not None \
                    and "bbox3d" in pending_h:
                # persistent window mutation (ref:UMGen.py:1464-1467):
                # keep the host mirror identical to what the in-graph
                # override bakes into the rings this step
                cb = np.asarray(control_bbox)[:, None]
                pending_h = dict(pending_h)
                pending_h["bbox3d"] = np.where(cb != -1, cb,
                                               pending_h["bbox3d"])

            self.rng, step_rng = jax.random.split(self.rng)
            if idx == 0:
                dev_inputs = self._place_inputs(
                    {m: jnp.asarray(out[m], dtype=jnp.int32) for m in mods})
                T0 = dev_inputs["pose"].shape[1]
                B0 = dev_inputs["pose"].shape[0]
                if self.model.config.chunked_prefill and T0 > 1:
                    # frame-by-frame ring ingestion: peak memory is one
                    # frame's activations, not the [B, T, S, D] window
                    ingest, cache_init = self._ingest_fns()
                    cache = cache_init(B0)
                    for t in range(T0 - 1):
                        frame_t = {m: dev_inputs[m][:, t:t + 1]
                                   for m in mods}
                        cache = ingest(self.params, frame_t,
                                       dev_inputs["pose"][:, t + 1], cache)
                    last = {m: dev_inputs[m][:, T0 - 1:] for m in mods}
                    res, cache = call_step(self.params, last, cache,
                                           step_rng,
                                           pose_override=pose_override,
                                           control_bbox=control_bbox,
                                           forced_tokens=fd)
                else:
                    res, cache = call_prefill(self.params, dev_inputs,
                                              step_rng,
                                              pose_override=pose_override,
                                              control_bbox=control_bbox,
                                              forced_tokens=fd)
                if refresh:
                    # host mirror of the ingested window (override on the
                    # newest cond frame already applied in-graph — mirror
                    # it here)
                    for t in range(T0):
                        hist.append({m: np.asarray(out[m][:, t:t + 1])
                                     for m in mods})
                    if control_bbox is not None:
                        cb = np.asarray(control_bbox)[:, None]
                        lastf = dict(hist[-1])
                        lastf["bbox3d"] = np.where(cb != -1, cb,
                                                   lastf["bbox3d"])
                        hist[-1] = lastf
            else:
                if (refresh and idx % refresh == 0
                        and len(hist) == window - 1
                        and T0 + idx > window):
                    # (T0 + idx = frames ingested after this step's
                    # ingestion — once it exceeds the window the ring
                    # has slid and absolute-index PEs diverge from the
                    # window-relative recompute semantics)
                    # rebuild the rings from the exact last-`window`
                    # frames with window-relative indices: the frame
                    # decoded now sees recompute semantics
                    # (ref:UMGen.py:1600-1603)
                    ingest, cache_init = self._ingest_fns()
                    cache = None          # free before the fresh rings
                    cache = cache_init(B0)
                    hl = list(hist)
                    for i, f in enumerate(hl):
                        nxt = (hl[i + 1]["pose"] if i + 1 < len(hl)
                               else pending_h["pose"])
                        dev_f = self._place_inputs(
                            {m: jnp.asarray(v, jnp.int32)
                             for m, v in f.items()})
                        dev_p = self._place_inputs(
                            {"pose": jnp.asarray(nxt[:, 0], jnp.int32)}
                        )["pose"]
                        cache = ingest(self.params, dev_f, dev_p, cache)
                newest = self._place_inputs(
                    {m: jnp.asarray(pending_h[m], jnp.int32) for m in mods})
                res, cache = call_step(self.params, newest, cache,
                                       step_rng,
                                       pose_override=pose_override,
                                       control_bbox=control_bbox,
                                       forced_tokens=fd)
                hist.append(pending_h)

            tokens = np.asarray(jax.device_get(res.tokens))
            self.spec_chunks += int(res.spec_chunks)
            self.spec_accepted += int(res.spec_accepted)
            frame = {m: tokens[:, sl[m]] for m in mods}
            # the generated frame becomes the next step's ingested raw frame
            pending_h = {m: frame[m][:, None] for m in mods}
            for m in mods:
                if frame_control and init is not None and m == "pose":
                    new = np.asarray(pose_override)[:, None]
                else:
                    new = frame[m][:, None]
                out[m] = np.concatenate([out[m], new], axis=1)

        return out

    def _ingest_fns(self):
        """(ingest, cache_init) for chunked prefill and ring refresh —
        per-spmd-mode, cached across calls."""
        fns = self._step_cache.get("ingest_fns")
        if fns is None:
            if self.spmd == "shard_map":
                sm = self._sm_cached_fns()
                fns = (sm["ingest"], sm["cache_init"])
            else:
                ingest = jax.jit(self._constrained_cache(
                    self.rollout.ingest_frame), donate_argnums=(3,))

                def cache_init(B0):
                    return jax.jit(self._constrained_cache(
                        lambda: self.model.init_tar_cache(B0)))()

                fns = (ingest, cache_init)
            self._step_cache["ingest_fns"] = fns
        return fns
