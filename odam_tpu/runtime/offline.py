"""Offline / batched execution modes.

The online pipeline (odam_tpu.runtime.processor) is frame-sequential because
association depends on the previous frame's track state.  Detection has no
such dependency — so for offline scene processing, detection runs *batched
ahead* over many frames at once (optionally sharded over a ``dp`` device
mesh), and only the cheap association step streams frame by frame over the
cached detections.  This is the SURVEY.md §7.6 design and BASELINE.json
config[1]/config[3] ("detection-only batched inference", "full val-split
streaming").
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import detr as detr_mod
from . import processor as proc_mod, tracker

Array = jax.Array


class BatchedDetector:
    """Batched DETR inference over frame stacks with fixed batch size."""

    def __init__(self, model, params, cfg: proc_mod.PipelineConfig,
                 batch_size: int = 8, mesh=None):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.mesh = mesh

        def run(params, images, K, img_w, img_h):
            if images.dtype == jnp.uint8:
                mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
                std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
                images = (images.astype(jnp.float32) / 255.0 - mean) / std
            outputs = self.model.apply(params, images)
            return detr_mod.postprocess(
                outputs, img_w, img_h, jnp.asarray(cfg.detect_threshold), K,
                max_dets=cfg.max_dets,
            )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("dp"))
            self._run = jax.jit(run, in_shardings=(repl, data, repl, repl, repl))
        else:
            self._run = jax.jit(run)

    def detect_frames(self, frames: Iterable[np.ndarray], K: np.ndarray,
                      img_w: float, img_h: float) -> list[detr_mod.Detections]:
        """Run detection over all frames, padded to full batches.

        Returns one per-frame Detections (batch axis stripped lazily — the
        arrays stay on device until indexed).
        """
        frames = list(frames)
        B = self.batch_size
        K = jnp.asarray(np.asarray(K, np.float32)[:3, :3])
        w = jnp.asarray(float(img_w))
        h = jnp.asarray(float(img_h))
        out: list[detr_mod.Detections] = []
        for start in range(0, len(frames), B):
            chunk = frames[start : start + B]
            pad = B - len(chunk)
            stack = np.stack(chunk + [chunk[-1]] * pad)
            if self.mesh is not None:
                from ..parallel import mesh as mesh_mod

                stack = mesh_mod.shard_batch(jnp.asarray(stack), self.mesh)
            dets = self._run(self.params, jnp.asarray(stack), K, w, h)
            for i in range(len(chunk)):
                out.append(jax.tree.map(lambda x: x[i : i + 1], dets))
        return out


class CachedDetectionPipeline(proc_mod.OdamPipeline):
    """Online pipeline variant that consumes precomputed detections.

    Splits the per-frame step after the detector: association + track update
    run from a cached Detections instead of an image, enabling the
    detect-batched-ahead execution mode and associator-only replays.
    """

    def __init__(self, assoc_model, assoc_params,
                 config: proc_mod.PipelineConfig = proc_mod.PipelineConfig()):
        self.assoc_model = assoc_model
        self.assoc_params = assoc_params
        self.cfg = config
        self.sequence = None
        self._assoc_step = self._build_assoc_step()

    def _build_assoc_step(self):
        cfg = self.cfg
        assoc_apply = self.assoc_model.apply

        @partial(jax.jit, donate_argnames=("store", "log"))
        def step(assoc_params, store, log, dets: detr_mod.Detections,
                 frame_id, T_wc, K, img_w, img_h):
            det_valid = dets.valid[0]
            det79 = proc_mod.detection_rows_camera(dets, frame_id, img_w, img_h)
            det82 = proc_mod.lift_rows_to_world(
                det79, det_valid, T_wc, img_w, img_h, cfg.no_code
            )
            store, log = proc_mod.update_tracks(
                cfg, assoc_apply, assoc_params, store, log,
                det79, det82, det_valid, T_wc, K, img_w, img_h,
            )
            return proc_mod.FrameResult(
                store=store, log=log,
                n_detections=jnp.sum(det_valid.astype(jnp.int32)),
            )

        return step

    def process_detections(self, dets: detr_mod.Detections, frame_id: int,
                           T_wc: np.ndarray) -> proc_mod.FrameResult:
        seq = self.sequence
        assert seq is not None, "call init_sequence first"
        seq["usable_frames"].append(int(frame_id))
        T_wc = np.asarray(T_wc, np.float32)
        seq["T_wcs"].append(T_wc)
        seq["P_cws"].append(seq["K"][:3, :3] @ np.linalg.inv(T_wc)[:3, :])
        seq["tracks_cache"] = None
        result = self._assoc_step(
            self.assoc_params, seq["store"], seq["log"], dets,
            jnp.asarray(float(frame_id)), jnp.asarray(T_wc),
            seq["K_dev"], seq["w_dev"], seq["h_dev"],
        )
        seq["store"] = result.store
        seq["log"] = result.log
        seq["frames_in_log"] += 1
        if seq["frames_in_log"] >= self.cfg.max_log_frames:
            self._drain_log_chunk()
        return result

    def process_frame(self, *a, **k):  # pragma: no cover - guard
        raise NotImplementedError(
            "CachedDetectionPipeline consumes Detections; use process_detections"
        )


def run_scene_offline(detector: BatchedDetector, assoc_pipeline: CachedDetectionPipeline,
                      frames: list[np.ndarray], frame_ids: list[int],
                      T_wcs: list[np.ndarray], K: np.ndarray,
                      img_h: float, img_w: float) -> dict:
    """Full offline scene pass: batched detection, streamed association,
    then mapping + merge + re-mapping (run_processor.py:81-83 order)."""
    assoc_pipeline.init_sequence(K, img_h, img_w)
    detections = detector.detect_frames(frames, K, img_w, img_h)
    for dets, fid, T_wc in zip(detections, frame_ids, T_wcs):
        assoc_pipeline.process_detections(dets, fid, T_wc)
    out = assoc_pipeline.optim_process(assoc_pipeline.tracks)
    merged = assoc_pipeline.merge_process(out)
    return assoc_pipeline.optim_process(merged)
