"""Scene-parallel execution: P pipeline replicas, one scene per device.

The reference processes a validation split serially, one scene at a time on
one GPU (src/scripts/run_processor.py:46-92).  The online per-frame step is
frame-sequential *within* a scene (association needs the previous frame's
track state) but scenes are fully independent — so the TPU-native way to
run a val split is to vmap the whole per-frame step body over a scene axis
and shard that axis across the device mesh: every device advances its own
scene's detector + associator + track store in lockstep, with zero
cross-device communication (SURVEY.md §2 DP plan: "per-scene sharding for
val-split runs").

Scenes of different lengths are padded to the longest; padded frames are
masked no-ops (branchless ``jnp.where`` on the carried state).  Host-side
mapping/merge run per scene afterwards — the batched superquadric solver
already handles a whole scene's objects in one call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import detr as detr_mod
from . import processor as proc_mod, tracker

Array = jax.Array


class SceneParallelRunner:
    """Drives P = mesh-size scenes concurrently through the online step."""

    def __init__(self, detr_model, detr_params, assoc_model, assoc_params,
                 cfg: proc_mod.PipelineConfig, mesh, axis: str = "dp",
                 n_lanes: int | None = None):
        self.detr_model = detr_model
        self.detr_params = detr_params
        self.assoc_model = assoc_model
        self.assoc_params = assoc_params
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        mesh_lanes = int(np.prod([mesh.shape[a] for a in mesh.axis_names])) \
            if axis is None else int(mesh.shape[axis])
        # n_lanes may exceed the mesh: lanes are a vmap axis sharded over
        # the mesh, so S lanes on D devices run S/D scenes batched PER
        # DEVICE — on one chip this is the batched-inference win (the
        # detector's batch-16 throughput is 2.8x its batch-1 latency mode)
        # applied to whole val-split scenes, not just detection.
        self.n_lanes = mesh_lanes if n_lanes is None else int(n_lanes)
        if self.n_lanes % mesh_lanes:
            raise ValueError(
                f"n_lanes {self.n_lanes} must divide evenly over the "
                f"{mesh_lanes}-way mesh axis {axis!r}")
        self._step = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        detr_apply = self.detr_model.apply
        assoc_apply = self.assoc_model.apply

        def one_scene(detr_params, assoc_params, store, log, image, frame_id,
                      T_wc, K, img_w, img_h, valid):
            mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
            if image.dtype == jnp.uint8:
                image = (image.astype(jnp.float32) / 255.0 - mean) / std
            res = proc_mod.frame_step_body(
                cfg, detr_apply, assoc_apply, detr_params, assoc_params,
                store, log, image, frame_id, T_wc, K, img_w, img_h,
            )
            # Padded frame slots: keep the carried state unchanged
            # (branchless — under vmap a lax.cond would become a select
            # over both branches anyway).
            keep = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(valid, a, b), new, old
            )
            return proc_mod.FrameResult(
                store=keep(res.store, store),
                log=keep(res.log, log),
                n_detections=jnp.where(valid, res.n_detections, 0),
            )

        vstep = jax.vmap(one_scene, in_axes=(None, None, 0, 0, 0, 0, 0, 0,
                                             None, None, 0))

        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        lane = NamedSharding(self.mesh, P(self.axis))
        return jax.jit(
            vstep,
            in_shardings=(repl, repl, lane, lane, lane, lane, lane, lane,
                          repl, repl, lane),
            out_shardings=proc_mod.FrameResult(store=lane, log=lane,
                                               n_detections=lane),
            donate_argnums=(2, 3),
        )

    def run_scenes(self, scenes: list[dict], img_h: float, img_w: float
                   ) -> list[dict]:
        """Run a group of scenes (one per mesh lane) to completion.

        Args:
            scenes: up to ``n_lanes`` dicts with keys ``frames`` (list of
                [H, W, 3] uint8/float32 arrays), ``frame_ids``, ``T_wcs``,
                and ``K`` ([3, 3]).

        Returns one reference-schema output dict per scene
        ({tracks, bboxes_qc, bboxes_dl, quadrics}), after the full mapping
        -> merge -> re-mapping chain (run_processor.py:81-83 order).
        """
        cfg = self.cfg
        P_lanes = self.n_lanes
        assert 1 <= len(scenes) <= P_lanes, (len(scenes), P_lanes)
        n_real = len(scenes)
        # Pad the lane axis by replicating scene 0 with all-invalid frames.
        scenes = scenes + [scenes[0]] * (P_lanes - n_real)

        F_max = max(len(s["frames"]) for s in scenes[:n_real])
        stores = _stack([tracker.init_store(cfg.max_tracks, cfg.window)
                         for _ in range(P_lanes)])
        logs = _stack([tracker.init_log(cfg.max_log_frames, cfg.max_dets)
                       for _ in range(P_lanes)])
        Ks = jnp.asarray(np.stack(
            [np.asarray(s["K"], np.float32)[:3, :3] for s in scenes]
        ))
        w_dev = jnp.asarray(float(img_w))
        h_dev = jnp.asarray(float(img_h))

        zero_img = np.zeros_like(np.asarray(scenes[0]["frames"][0]))
        eye = np.eye(4, dtype=np.float32)
        for f in range(F_max):
            imgs, fids, poses, valid = [], [], [], []
            for lane, s in enumerate(scenes):
                ok = lane < n_real and f < len(s["frames"])
                imgs.append(np.asarray(s["frames"][f]) if ok else zero_img)
                fids.append(float(s["frame_ids"][f]) if ok else 0.0)
                poses.append(np.asarray(s["T_wcs"][f], np.float32)
                             if ok else eye)
                valid.append(ok)
            res = self._step(
                self.detr_params, self.assoc_params, stores, logs,
                jnp.asarray(np.stack(imgs)), jnp.asarray(fids, jnp.float32),
                jnp.asarray(np.stack(poses)), Ks, w_dev, h_dev,
                jnp.asarray(valid),
            )
            stores, logs = res.store, res.log

        # Per-scene host finalization: drain, map, merge, re-map.
        outs = []
        for lane in range(n_real):
            s = scenes[lane]
            pipe = _FinalizeShim(self.cfg)
            pipe.init_sequence(np.asarray(s["K"], np.float32), img_h, img_w)
            seq = pipe.sequence
            seq["usable_frames"] = [int(f) for f in s["frame_ids"]]
            seq["T_wcs"] = [np.asarray(T, np.float32) for T in s["T_wcs"]]
            seq["P_cws"] = [
                np.asarray(s["K"], np.float32)[:3, :3]
                @ np.linalg.inv(np.asarray(T, np.float64)).astype(np.float32)[:3, :]
                for T in s["T_wcs"]
            ]
            seq["log"] = jax.tree.map(lambda x: x[lane], logs)
            seq["store"] = jax.tree.map(lambda x: x[lane], stores)
            out = pipe.optim_process(pipe.tracks)
            merged = pipe.merge_process(out)
            outs.append(pipe.optim_process(merged))
        return outs


class _FinalizeShim(proc_mod.OdamPipeline):
    """OdamPipeline host surface (tracks/optim/merge) without models —
    the scene-parallel runner already produced the device state."""

    def __init__(self, cfg: proc_mod.PipelineConfig):
        self.cfg = cfg
        self.sequence = None

    def _build_step(self):  # pragma: no cover - never stepped
        raise NotImplementedError


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
