"""Scene-rollout harness: drives generation, token saving, decode and video.

Rebuild of the reference Lightning harness (ref:projects/tools/model_pl.py
``UMGen_PL``) as a plain driver: no Lightning, no device juggling (the
reference moves the whole model to CPU during VQ decode to dodge OOM,
ref:model_pl.py:366-368 — irrelevant here since decode is its own jitted
program).  Keeps the observable contract: token pickles named
``<scene>_tokens.pkl`` under ``saved_token/``, skip-if-exists resume, mp4s
under ``video/``.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Optional, Sequence

import numpy as np

from umgen_tpu.config import InferConfig
from umgen_tpu.data.pipeline import ScenePipeline
from umgen_tpu.models.generate import Generator
from umgen_tpu.ops.collision import BoxOverlap
from umgen_tpu.ops.metrics import MMDMetric


class SceneRunner:
    def __init__(self, generator: Generator,
                 infer_config: InferConfig,
                 output_path: str = "output/UMGen",
                 pipeline: Optional[ScenePipeline] = None,
                 map_decoder=None, image_decoder=None,
                 save_video: bool = True,
                 init_token_mod: Optional[Sequence[str]] = None,
                 gt_video: bool = True):
        """init_token_mod: modalities forced to GT during generation (the
        reference's init-token replay for FID/MMD evaluation,
        ref:model_pl.py:103-130), e.g. ("map", "image").
        gt_video: render the pred|GT side-by-side panel when the clip has a
        GT continuation (ref:model_pl.py:283-315 + visulize.py:1607-1633)."""
        self.gen = generator
        self.cfg = infer_config
        self.pipeline = pipeline or ScenePipeline()
        self.map_decoder = map_decoder
        self.image_decoder = image_decoder
        self.save_video = save_video
        self.init_token_mod = tuple(init_token_mod or ())
        self.gt_video = gt_video
        self.output_path = output_path
        self.token_save_path = os.path.join(output_path, "saved_token")
        self.video_save_path = os.path.join(output_path, "video")
        os.makedirs(self.token_save_path, exist_ok=True)
        os.makedirs(self.video_save_path, exist_ok=True)
        self.box_overlap = BoxOverlap()
        self.mmd = MMDMetric()
        self.timings = []

    # ------------------------------------------------------------------
    def run_scene(self, batch: Dict, control_test: bool = False) -> Optional[
            Dict[str, np.ndarray]]:
        """One scene: rollout → save → decode → video.

        batch: token dict from the dataset (video mode) or a control pkl
        dict with 'dataset_token'/'control_dict' (control mode,
        ref:model_pl.py:132-200).
        """
        if control_test:
            gt = batch["dataset_token"]
            control = batch.get("control_dict") or {}
            file_name = str(batch.get("scene_name", "control_scene"))
            init = {m: np.asarray(v) for m, v in control.items()}
            input_cond = int(batch.get("input_cond_frame",
                                       self.cfg.input_cond_frames))
        else:
            gt = batch
            control, init = {}, None
            file_name = os.path.basename(
                str(batch.get("file_name", "scene"))).replace(".pkl", "")
            input_cond = self.cfg.input_cond_frames

        token_path = os.path.join(self.token_save_path,
                                  f"{file_name}_tokens.pkl")
        if os.path.exists(token_path):
            # skip-if-exists resume (ref:model_pl.py:215-216)
            print(f"{file_name} has been processed")
            return None

        mods = self.gen.model.layout.mod_order
        cond = {}
        for m in mods:
            arr = np.asarray(gt[m])
            if arr.ndim == 2:
                arr = arr[None]
            cond[m] = arr.astype(np.int64)

        if init is not None:
            init = {m: (v[None] if v.ndim == 2 else v) for m, v in
                    init.items()}
            if "no_control" in file_name:
                init, control_test = None, False

        new_frames = self.cfg.num_new_frames
        if new_frames == -1:
            new_frames = cond["bbox3d"].shape[1] - input_cond

        # init_token_mod replay: force the listed modalities to the GT
        # continuation during generation (ref:model_pl.py:103-130)
        forced = None
        if self.init_token_mod and not control_test:
            forced = {m: cond[m][:, input_cond:input_cond + new_frames]
                      for m in self.init_token_mod
                      if m in cond and cond[m].shape[1] > input_cond}
            forced = forced or None

        t0 = time.perf_counter()
        out = self.gen.generate(cond, new_frames=new_frames,
                                cond_frames=self.cfg.cond_frames,
                                input_cond_frames=input_cond,
                                init_tokens=init, control_test=control_test,
                                forced_streams=forced,
                                progress=True)
        dt = time.perf_counter() - t0
        self.timings.append({"scene": file_name, "frames": new_frames,
                             "seconds": dt,
                             "frames_per_sec": new_frames / dt})

        self._postprocess(out, gt, file_name, input_cond)
        return out

    # ------------------------------------------------------------------
    def run_scenes(self, batches, control_test: bool = False,
                   pad_to: int = 1):
        """Batched multi-scene rollout: stack the scenes on the batch axis
        and run ONE generate() call (the per-chip scene batch is the
        throughput lever — see bench.py), then save/decode/render each
        scene.  Control batches carry per-scene init dicts and fall back
        to the per-scene path.  pad_to > 1 pads the batch by repeating the
        last scene so a dp mesh divides it (padding outputs discarded)."""
        if control_test or (len(batches) == 1 and pad_to <= 1):
            return [self.run_scene(b, control_test) for b in batches]

        mods = self.gen.model.layout.mod_order
        todo = []
        for b in batches:
            file_name = os.path.basename(
                str(b.get("file_name", "scene"))).replace(".pkl", "")
            if os.path.exists(os.path.join(self.token_save_path,
                                           f"{file_name}_tokens.pkl")):
                print(f"{file_name} has been processed")
                continue
            todo.append((file_name, b))
        if not todo:
            return []

        input_cond = self.cfg.input_cond_frames
        T0 = min(np.asarray(b["pose"]).shape[0 if np.asarray(
            b["pose"]).ndim == 2 else 1] for _, b in todo)
        cond = {}
        for m in mods:
            rows = []
            for _, b in todo:
                arr = np.asarray(b[m])
                if arr.ndim == 2:
                    arr = arr[None]
                rows.append(arr[:, :T0].astype(np.int64))
            cond[m] = np.concatenate(rows, axis=0)
        n_pad = (-len(todo)) % pad_to
        if n_pad:
            cond = {m: np.concatenate(
                [v] + [v[-1:]] * n_pad, axis=0) for m, v in cond.items()}

        new_frames = self.cfg.num_new_frames
        if new_frames == -1:
            new_frames = T0 - input_cond

        forced = None
        if self.init_token_mod:
            forced = {m: cond[m][:, input_cond:input_cond + new_frames]
                      for m in self.init_token_mod
                      if m in cond and cond[m].shape[1] > input_cond}
            forced = forced or None

        t0 = time.perf_counter()
        out = self.gen.generate(cond, new_frames=new_frames,
                                cond_frames=self.cfg.cond_frames,
                                input_cond_frames=input_cond,
                                forced_streams=forced,
                                progress=True)
        dt = time.perf_counter() - t0
        self.timings.append({"scene": f"batch[{len(todo)}]",
                             "frames": new_frames, "seconds": dt,
                             "frames_per_sec": len(todo) * new_frames / dt})

        outs = []
        for i, (file_name, b) in enumerate(todo):
            per = {m: out[m][i:i + 1] for m in mods}
            self._postprocess(per, b, file_name, input_cond)
            outs.append(per)
        return outs

    # ------------------------------------------------------------------
    def _postprocess(self, out, gt, file_name: str, input_cond: int):
        """Per-scene token save, detokenize, metrics, video."""
        self.save_tokens(out, file_name)
        try:
            decoded = self.decode_tokens(out)
        except Exception as e:
            # journal scenes whose decode failed so they can be re-decoded
            # offline (the reference's undecoded_token.txt,
            # ref:model_pl.py:343-348)
            with open(os.path.join(self.token_save_path,
                                   "undecoded_token.txt"), "a") as f:
                f.write(file_name + "\n")
            print(f"decode failed for {file_name}: {e}")
            return
        if "bbox3d" not in out:      # agent-free task: no agent metrics
            if self.save_video:
                self.render_video(decoded, file_name,
                                  cond_frames=input_cond)
            return
        # MMD between generated frames and the GT continuation when the
        # clip is long enough (the paper's agent-realism metric)
        gt_bbox = np.asarray(gt["bbox3d"])
        if gt_bbox.ndim == 2:
            gt_bbox = gt_bbox[None]
        if gt_bbox.shape[1] > input_cond:
            gt_boxes, gt_cats, gt_valid = self.pipeline.decode_bboxes(
                gt_bbox[0, input_cond:])
            pb, pc, pv = (decoded["boxes"][input_cond:],
                          decoded["cat_ids"][input_cond:],
                          decoded["valid"][input_cond:])
            n = min(len(gt_boxes), len(pb))
            if n > 0:
                self.mmd.update(pb[:n][pv[:n]], pc[:n][pv[:n]],
                                gt_boxes[:n][gt_valid[:n]],
                                gt_cats[:n][gt_valid[:n]])
        if self.save_video:
            self.render_video(decoded, file_name,
                              cond_frames=input_cond, gt=gt)

    # ------------------------------------------------------------------
    def save_tokens(self, out_tokens: Dict[str, np.ndarray],
                    file_name: str):
        path = os.path.join(self.token_save_path, f"{file_name}_tokens.pkl")
        with open(path, "wb") as f:
            pickle.dump(out_tokens, f)

    # ------------------------------------------------------------------
    def decode_tokens(self, out_tokens: Dict[str, np.ndarray]) -> Dict:
        """Token streams → metric boxes, pose values, decoded rasters
        (ref:model_pl.py:357-457)."""
        res: Dict = {}
        T = out_tokens["pose"].shape[1]
        if "bbox3d" in out_tokens:
            boxes, cats, valid = self.pipeline.decode_bboxes(
                out_tokens["bbox3d"][0])
        else:                        # agent-free tasks (e.g. pose_map)
            boxes = np.zeros((T, 0, 10), np.float32)
            cats = np.zeros((T, 0), np.int32)
            valid = np.zeros((T, 0), bool)
        res["boxes"], res["cat_ids"], res["valid"] = boxes, cats, valid
        res["pose"] = self.pipeline.decode_pose(out_tokens["pose"][0])
        if self.map_decoder is not None and "map" in out_tokens:
            res["maps_rgb"] = self.map_decoder.decode(out_tokens["map"][0])
        if self.image_decoder is not None and "image" in out_tokens:
            res["images"] = self.image_decoder.decode(
                out_tokens["image"][0])
        # collision-rate metric over generated frames
        frames = [boxes[t][valid[t]] for t in range(boxes.shape[0])]
        self.box_overlap.update(frames)
        return res

    # ------------------------------------------------------------------
    def render_video(self, decoded: Dict, file_name: str,
                     cond_frames: int, gt: Optional[Dict] = None
                     ) -> Optional[str]:
        """Render the rollout mp4.  With `gt` (and gt_video on) the default
        output is the reference's prediction|GT side-by-side panel
        (ref:model_pl.py:283-315 + visulize.py:1607-1633); otherwise the
        single-panel scene video."""
        try:
            from umgen_tpu.tools.visualize import (render_pred_gt_video,
                                                   render_scene_video)
        except Exception:
            return None
        pose = decoded["pose"].copy()
        pose[:, 2] = pose[:, 2] * 180.0 / np.pi
        path = os.path.join(self.video_save_path, f"{file_name}.mp4")
        if gt is not None and self.gt_video and "bbox3d" in gt:
            gt_bbox = np.asarray(gt["bbox3d"])
            if gt_bbox.ndim == 2:
                gt_bbox = gt_bbox[None]
            T = decoded["boxes"].shape[0]
            gb, gc, gv = self.pipeline.decode_bboxes(gt_bbox[0, :T])
            if gb.shape[0] < T:   # GT shorter than rollout: pad invalid
                pad = T - gb.shape[0]
                gb = np.concatenate(
                    [gb, np.zeros((pad,) + gb.shape[1:], gb.dtype)])
                gc = np.concatenate(
                    [gc, np.zeros((pad,) + gc.shape[1:], gc.dtype)])
                gv = np.concatenate(
                    [gv, np.zeros((pad,) + gv.shape[1:], bool)])
            gt_maps = None
            if self.map_decoder is not None and "map" in gt:
                gm = np.asarray(gt["map"])
                if gm.ndim == 2:
                    gm = gm[None]
                gt_maps = np.asarray(self.map_decoder.decode(gm[0, :T]))
                if gt_maps.shape[0] < T:
                    gt_maps = np.concatenate(
                        [gt_maps, np.zeros((T - gt_maps.shape[0],)
                                           + gt_maps.shape[1:],
                                           gt_maps.dtype)])
            return render_pred_gt_video(
                path, decoded["boxes"], decoded["cat_ids"],
                decoded["valid"], gt_boxes=gb, gt_cats=gc, gt_valid=gv,
                pred_maps=decoded.get("maps_rgb"), gt_maps=gt_maps,
                pose=pose, cond_frames=cond_frames)
        gt_pose = None
        if gt is not None and "pose" in gt:
            gp = np.asarray(gt["pose"])
            if gp.ndim == 3:
                gp = gp[0]
            gt_pose = self.pipeline.decode_pose(gp)
            gt_pose[:, 2] = gt_pose[:, 2] * 180.0 / np.pi
        return render_scene_video(
            path,
            decoded["boxes"], decoded["cat_ids"], decoded["valid"],
            pose=pose,
            maps_rgb=decoded.get("maps_rgb"),
            images=decoded.get("images"),
            cond_frames=cond_frames,
            scene_name=file_name,
            gt_pose=gt_pose)
