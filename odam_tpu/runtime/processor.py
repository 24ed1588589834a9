"""The online per-frame pipeline: detect -> associate -> track -> map.

TPU-native re-architecture of the reference OdamProcess (src/processor.py):
the reference interleaves host NumPy, CUDA forwards, a C++ sampler, and
scipy assignment every frame; here the *entire* per-frame body — DETR
forward, postprocess/NMS, track-state projection (superquadric surface ->
current camera), associator GNN + Sinkhorn, Hungarian decode, score gating,
and track-store update — is one jitted XLA program with no host round-trip.
The host keeps only the append-only full observation history that the
offline mapping/merge stages consume.

Pipeline knobs match the reference defaults: detect threshold 0.6, match
threshold 0.1, attach-score threshold 0.8, <=30 detections/frame, 100-step
track window (processor.py:22-24, 318, 133).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..mapping import constraints, merge, optimizer, prior, superquadric as sq
from ..models import associator as assoc_mod
from ..models import detr as detr_mod
from ..utils import geometry as geo
from . import tracker

Array = jax.Array


@dataclass(frozen=True)
class PipelineConfig:
    detect_threshold: float = 0.6
    match_threshold: float = 0.1
    score_threshold: float = 0.8
    max_tracks: int = 64
    max_dets: int = 30
    window: int = 100
    representation: str = "super_quadric"
    use_prior: bool = True
    no_code: bool = True
    track_bbox_samples: int = 1000  # surface samples for track re-projection
    track_bbox_mode: str = "sampled"  # "sampled" (reference parity) | "exact"
    optim_solver: str = "adam"  # "adam" (reference-exact) | "lm" (fast GN/LM)
    optim_iters: int = 200
    optim_samples: int = 1000
    min_views: int = 10
    robust_init: bool = False  # median (vs reference mean) mapping init
    max_objs: int = 64       # mapping-stage object capacity
    max_views: int = 256     # mapping-stage views per object
    max_log_frames: int = 6000  # device observation-log capacity per scene
    resize_on_device: bool = False  # accept raw-size frames; resize inside the step


class FrameResult(NamedTuple):
    """Per-frame device outputs (all stay on device; the host drains the
    observation log once per sequence)."""

    store: tracker.TrackStore
    log: tracker.FrameLog
    n_detections: Array  # [] int32


def detection_rows_camera(dets: detr_mod.Detections, frame_id: Array,
                          img_w: Array, img_h: Array) -> Array:
    """Assemble the 79-dim camera-frame detection rows (processor.py:269-288).

    Layout: [frame_id, class, bbox_norm(4), dims(3), t_co(3), sin azi,
    cos azi, score, code(64) = -1].  Angles arrive in degrees from
    postprocess and are converted to radians here (processor.py:270).
    """
    b = 0  # single image
    N = dets.valid.shape[1]
    angle_rad = dets.angle_deg[b] * (jnp.pi / 180.0)
    norm = jnp.stack([img_w, img_h, img_w, img_h]).astype(jnp.float32)
    rows = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(frame_id, jnp.float32), (N,))[:, None],
            dets.classes[b][:, None].astype(jnp.float32),
            dets.boxes[b] / norm,
            dets.dims[b],
            dets.t_co[b],
            jnp.sin(angle_rad)[:, None],
            jnp.cos(angle_rad)[:, None],
            dets.scores[b][:, None],
            jnp.full((N, 64), -1.0),
        ],
        axis=-1,
    )
    return jnp.where(dets.valid[b][:, None], rows, -1.0)


def lift_rows_to_world(det79: Array, det_valid: Array, T_wc: Array,
                       img_w: Array, img_h: Array, no_code: bool = True) -> Array:
    """Camera-frame 79-dim rows -> world-frame 82-dim track rows.

    Reference behavior: processor.py:209-257 (_attach_to_tracks) /
    95-131 (_init_tracks): t_wo = T_wc t_co; azi_wo = atan2(sin, cos) +
    cam_azi; bbox stored in pixels in both the detection columns (2:6) and
    the projected-bbox columns (78:82).
    """
    N = det79.shape[0]
    cam_azi = geo.camera_azimuth(T_wc)
    t_co = det79[:, 9:12]
    t_wo = geo.transform_points(T_wc, t_co)
    azi_wo = jnp.arctan2(det79[:, 12], det79[:, 13]) + cam_azi
    norm = jnp.stack([img_w, img_h, img_w, img_h]).astype(jnp.float32)
    bbox_px = det79[:, 2:6] * norm
    code = jnp.full((N, 64), -1.0) if no_code else det79[:, 15:79]
    rows = jnp.concatenate(
        [
            det79[:, 0:2],
            bbox_px,
            det79[:, 6:9],
            t_wo,
            azi_wo[:, None],
            det79[:, 14:15],
            code,
            bbox_px,
        ],
        axis=-1,
    )
    return jnp.where(det_valid[:, None], rows, -1.0)


def prepare_track_inputs(store: tracker.TrackStore, T_wc: Array, K: Array,
                         img_w: Array, img_h: Array,
                         n_samples: int = 1000,
                         mode: str = "sampled") -> Array:
    """Build the [T, W, 79] associator input from the track store.

    Reference behavior (processor.py:133-207): refresh each track's projected
    bbox by projecting the mean-state superquadric surface into the current
    camera (plain z division, no validity filtering — reference
    _prepare_tracks:199-203), overwrite the bbox columns of every window row
    with it (normalized, clipped to [-1, 2]), and re-encode world state into
    the current camera frame.

    ``mode="sampled"`` mirrors the reference's 1000-point surface sampling of
    the shapes=0 superellipsoid (squashed exponent 0.9, sq_libs.py:583);
    ``mode="exact"`` replaces it with the closed-form dual-conic bounding box
    of the mean-state ellipsoid (mapping.quadric) — the analytic bbox of the
    epsilon=1 surface, within ~2% of the epsilon=0.9 sampled extremes but
    with no [T, S, 3] surface pipeline at all.
    """
    T_cap, W, _ = store.window.shape
    t_mean, azi_mean, dims_mean = tracker.mean_state(store)

    T_cw = geo.invert_se3(T_wc)
    if mode == "exact":
        from ..mapping import quadric as quadric_mod

        scale_sq = (dims_mean / 2.0) ** 2  # squared semi-axes (dims/2)^2
        Q = quadric_mod.quadric_matrix(t_mean, azi_mean, scale_sq)  # [T, 4, 4]
        P = jnp.einsum("ij,jk->ik", K, T_cw[:3, :])                 # [3, 4]
        box = quadric_mod.quadric_bbox(Q, P)                        # [T, 4]
    else:
        params = sq.SQParams(
            translate=t_mean,
            angle=azi_mean,
            scales=jnp.sqrt(dims_mean / 2.0),
            shapes=jnp.zeros((T_cap, 2), t_mean.dtype),  # ellipsoid mode
        )
        pts_w = sq.surface_points_world(params, n_samples)        # [T, S, 3]
        pts_c = geo.transform_points(T_cw, pts_w)
        pix = jnp.einsum("ij,tsj->tsi", K, pts_c)
        uv = pix[..., :2] / pix[..., 2:]                           # plain division
        box = jnp.concatenate([jnp.min(uv, axis=1), jnp.max(uv, axis=1)], axis=-1)
    norm = jnp.stack([img_w, img_h, img_w, img_h]).astype(jnp.float32)
    box_n = jnp.clip(box / norm, -1.0, 2.0)                        # [T, 4]

    win = store.window
    import os as _os

    if _os.environ.get("ODAM_FAULT_INJECT") == "stale_track_bbox":
        # Test instrumentation (examples/cli_rehearsal/ablate.py): SKIP the
        # reference's per-frame projected-bbox refresh (_prepare_tracks,
        # processor.py:190-203) and feed each window row's stored
        # attach-time bbox instead.  Exists to prove the discriminative
        # rehearsal detects an injected pipeline bug as an F1 drop; never
        # set in production.
        box_bcast = jnp.clip(win[..., 78:82] / norm, -1.0, 2.0)
    else:
        box_bcast = jnp.broadcast_to(box_n[:, None, :], box_n.shape[:1] + (win.shape[1], 4))
    cam_azi = geo.camera_azimuth(T_wc)
    t_wo = win[..., 9:12]
    t_co = geo.transform_points(T_cw, t_wo.reshape(T_cap * W, 3)).reshape(T_cap, W, 3)
    ang = win[..., 12] - cam_azi

    out = jnp.concatenate(
        [
            win[..., 0:2],                                  # time, class
            box_bcast,
            win[..., 6:9],                                  # dims
            t_co,
            jnp.sin(ang)[..., None],
            jnp.cos(ang)[..., None],
            win[..., 13:14],                                # score
            win[..., 14:78],                                # code
        ],
        axis=-1,
    )
    slot_valid = (
        (jnp.arange(W)[None, :] < store.length[:, None]) & store.active[:, None]
    )
    return jnp.where(slot_valid[..., None], out, -1.0)


def update_tracks(cfg: PipelineConfig, assoc_apply, assoc_params,
                  store: tracker.TrackStore, log: tracker.FrameLog,
                  det79: Array, det82: Array, det_valid: Array,
                  T_wc: Array, K: Array, img_w: Array, img_h: Array
                  ) -> tuple[tracker.TrackStore, tracker.FrameLog]:
    """Associate one frame's detections against the store and update it.

    The shared tail of both the online and cached-detection steps: first
    frame spawns tracks directly (processor.py:320-323); later frames run the
    associator and gate attach/new-track on the Sinkhorn scores
    (processor.py:209-257).  Slots matched this frame are protected from
    capacity eviction; the observation log records global track ids.
    """
    T_cap = store.capacity

    def init_branch(store):
        store, slots = tracker.assign_new_slots(store, det_valid)
        ok = det_valid & (slots >= 0)
        return tracker.append_rows(store, det82, slots, ok), slots, ok

    def assoc_branch(store):
        tracks79 = prepare_track_inputs(
            store, T_wc, K, img_w, img_h, cfg.track_bbox_samples,
            cfg.track_bbox_mode,
        )
        out = assoc_apply(
            assoc_params, tracks79[None], store.active[None],
            det79[None], det_valid[None], jnp.asarray(cfg.match_threshold),
        )
        Z = out.log_assignment[0]
        match = out.matches[0]
        # Unmatched detections are gated on the dustbin row — the reference's
        # score_mat[-1, det] new-track gate (processor.py:226-229, 252-253).
        gate_row = jnp.where(match >= 0, match, T_cap)
        gate = jnp.exp(Z[gate_row, jnp.arange(match.shape[0])])
        attach_ok = det_valid & (gate >= cfg.score_threshold)
        is_new = attach_ok & (match < 0)
        matched_mask = (
            jnp.zeros((T_cap,), bool)
            .at[jnp.where(match >= 0, match, T_cap)]
            .set(True, mode="drop")
        )
        store, new_slots = tracker.assign_new_slots(
            store, is_new, protected=matched_mask
        )
        slots = jnp.where(match >= 0, match, new_slots)
        ok = attach_ok & (slots >= 0)
        return tracker.append_rows(store, det82, slots, ok), slots, ok

    store, slots, attached = jax.lax.cond(
        store.count > 0, assoc_branch, init_branch, store
    )
    ids = jnp.where(
        attached & (slots >= 0),
        store.track_id[jnp.clip(slots, 0, T_cap - 1)],
        -1,
    )
    log = tracker.log_frame(log, det82, ids)
    return store, log


def frame_step_body(cfg: PipelineConfig, detr_apply, assoc_apply,
                    detr_params, assoc_params, store: tracker.TrackStore,
                    log: tracker.FrameLog, image: Array, frame_id: Array,
                    T_wc: Array, K: Array, img_w: Array, img_h: Array
                    ) -> FrameResult:
    """The pure per-frame step: DETR forward -> postprocess/NMS -> row
    assembly -> associate -> track-store update.

    ``image`` is an already-normalized float32 [H, W, 3] frame.  Shared by
    the online pipeline's jitted step (which adds transport/normalize/resize
    in front) and the scene-parallel runner (which vmaps this body over a
    scene axis sharded across the device mesh).
    """
    outputs = detr_apply(detr_params, image[None])
    dets = detr_mod.postprocess(
        outputs, img_w, img_h, jnp.asarray(cfg.detect_threshold), K,
        max_dets=cfg.max_dets,
    )
    det_valid = dets.valid[0]
    det79 = detection_rows_camera(dets, frame_id, img_w, img_h)
    det82 = lift_rows_to_world(det79, det_valid, T_wc, img_w, img_h,
                               cfg.no_code)
    store, log = update_tracks(
        cfg, assoc_apply, assoc_params, store, log,
        det79, det82, det_valid, T_wc, K, img_w, img_h,
    )
    return FrameResult(
        store=store,
        log=log,
        n_detections=jnp.sum(det_valid.astype(jnp.int32)),
    )


class OdamPipeline:
    """Host driver around the jitted per-frame step.

    Equivalent public surface to the reference OdamProcess (processor.py:15-368):
    ``init_sequence(K, img_h, img_w)`` / ``process_frame(rgb, frame_id, T_wc)``
    / ``optim_process(tracks)`` / ``merge_process(out)``.
    """

    def __init__(self, detr_model: detr_mod.DETR, detr_params,
                 assoc_model: assoc_mod.Associator, assoc_params,
                 config: PipelineConfig = PipelineConfig()):
        self.detr_model = detr_model
        self.detr_params = detr_params
        self.assoc_model = assoc_model
        self.assoc_params = assoc_params
        self.cfg = config
        self.sequence = None
        self._resize_to: tuple[int, int] = (0, 0)
        self._step = self._build_step()

    # ------------------------------------------------------------------ step
    def _build_step(self):
        cfg = self.cfg
        detr_apply = self.detr_model.apply
        assoc_apply = self.assoc_model.apply
        # Transport decodes straight into the model's compute dtype: the
        # backbone casts anyway, and materializing bf16 instead of f32
        # halves the decoded image's write traffic.
        model_dtype = getattr(getattr(self.detr_model, "config", None),
                              "dtype", None)

        @partial(jax.jit, donate_argnames=("store", "log"))
        def step(detr_params, assoc_params, store: tracker.TrackStore,
                 log: tracker.FrameLog, image, frame_id: Array,
                 T_wc: Array, K: Array, img_w: Array, img_h: Array) -> FrameResult:
            mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
            if isinstance(image, tuple):
                # YUV 4:2:0 transport: (Y uint8 [H, W], UV uint8 [H/2, W/2, 2])
                # — half the host-link bytes of packed RGB; reconstructed,
                # normalized, and cast in ONE fused pass on the VPU (the
                # unfused chain cost ~0.6 ms/frame at 800x1071: the round-3
                # 113.9 -> 105.9 fps step regression, BENCHMARKS.md).
                from ..data.transforms import yuv420_to_normalized_device

                image = yuv420_to_normalized_device(
                    *image, mean=mean, std=std, dtype=model_dtype)
            elif image.dtype == jnp.uint8:
                # On-device ImageNet normalization: ships 3x fewer bytes per
                # frame over the host link than pre-normalized float32.
                image = (image.astype(jnp.float32) / 255.0 - mean) / std
                if model_dtype is not None:
                    image = image.astype(model_dtype)
            if cfg.resize_on_device and image.shape[:2] != self._resize_to:
                # Raw-resolution frame in; bilinear resize on the VPU.  The
                # target is the sequence's detector resolution (static; read
                # at trace time — a new input shape retraces and re-reads).
                image = jax.image.resize(
                    image, self._resize_to + (3,), "bilinear"
                )
            return frame_step_body(
                cfg, detr_apply, assoc_apply, detr_params, assoc_params,
                store, log, image, frame_id, T_wc, K, img_w, img_h,
            )

        return step

    # ------------------------------------------------------------- sequence
    def init_sequence(self, K: np.ndarray, img_h: int, img_w: int):
        """Reset per-sequence state (processor.py:291-304).  Per-sequence
        constants are placed on device once; per-frame host traffic is one
        image + one small pose/meta array, nothing comes back until the
        sequence ends."""
        self._resize_to = (int(img_h), int(img_w))
        self.sequence = {
            "K": np.asarray(K, np.float32),
            "K_dev": jnp.asarray(np.asarray(K, np.float32)[:3, :3]),
            "img_h": float(img_h),
            "img_w": float(img_w),
            "w_dev": jnp.asarray(float(img_w)),
            "h_dev": jnp.asarray(float(img_h)),
            "store": tracker.init_store(self.cfg.max_tracks, self.cfg.window),
            "log": tracker.init_log(self.cfg.max_log_frames, self.cfg.max_dets),
            "usable_frames": [],
            "T_wcs": [],
            "P_cws": [],
            "tracks_cache": None,
            "history": {},           # global track id -> [list of row chunks]
            "frames_in_log": 0,      # host-side log fill counter (no sync)
        }

    @staticmethod
    def put_frame(image):
        """Start the (async) host->device transfer of a frame.

        Call this for frame n+1 while frame n's step is in flight to overlap
        H2D with compute (see data.loader.device_prefetch); ``process_frame``
        accepts the returned device handle(s) directly.  No-op for arrays
        already on device."""
        import jax

        if isinstance(image, tuple):
            return tuple(jax.device_put(p) for p in image)
        return jax.device_put(image)

    def process_frame(self, image: np.ndarray, frame_id: int,
                      T_wc: np.ndarray) -> FrameResult:
        """Run one frame. ``image`` is [H, W, 3] — uint8 (normalized on
        device) or already-normalized float32, or the device handle(s) from
        ``put_frame``.  Fully asynchronous: no device->host synchronization
        happens here."""
        seq = self.sequence
        assert seq is not None, "call init_sequence first"
        seq["usable_frames"].append(int(frame_id))
        T_wc = np.asarray(T_wc, np.float32)
        seq["T_wcs"].append(T_wc)
        seq["P_cws"].append(seq["K"][:3, :3] @ np.linalg.inv(T_wc)[:3, :])
        seq["tracks_cache"] = None

        image_dev = self.put_frame(image)
        result = self._step(
            self.detr_params, self.assoc_params, seq["store"], seq["log"],
            image_dev, jnp.asarray(float(frame_id)),
            jnp.asarray(T_wc), seq["K_dev"], seq["w_dev"], seq["h_dev"],
        )
        seq["store"] = result.store
        seq["log"] = result.log
        seq["frames_in_log"] += 1
        if seq["frames_in_log"] >= self.cfg.max_log_frames:
            self._drain_log_chunk()
        return result

    def _drain_log_chunk(self) -> None:
        """Pull the device log into host history and reset it.

        Triggered by the host-side frame counter (no device sync needed to
        decide), so scenes longer than ``max_log_frames`` lose nothing —
        one bulk transfer per chunk instead of per-frame pulls.
        """
        seq = self.sequence
        for tid, rows in tracker.drain_log(seq["log"]).items():
            seq["history"].setdefault(tid, []).append(rows)
        seq["log"] = tracker.init_log(self.cfg.max_log_frames, self.cfg.max_dets)
        seq["frames_in_log"] = 0

    @property
    def tracks(self) -> list[np.ndarray]:
        """Full per-track observation history: drained chunks + current log,
        grouped by global track id in spawn order (matching the reference's
        track-list append order)."""
        seq = self.sequence
        if seq["tracks_cache"] is None:
            merged: dict[int, list] = {
                tid: list(chunks) for tid, chunks in seq["history"].items()
            }
            for tid, rows in tracker.drain_log(seq["log"]).items():
                merged.setdefault(tid, []).append(rows)
            seq["tracks_cache"] = [
                np.concatenate(chunks, axis=0)
                for _, chunks in sorted(merged.items())
                if sum(len(c) for c in chunks) > 0
            ]
        return seq["tracks_cache"]

    def overflow_report(self, warn: bool = True) -> dict:
        """Capacity counters for the sequence (one device pull).

        Nonzero ``n_dropped`` / ``log_frames_lost`` mean observations were
        lost; ``n_evicted`` means stale track fragments were recycled out of
        the associator window (their history is preserved for mapping)."""
        seq = self.sequence
        report = {
            "n_evicted": int(seq["store"].n_evicted),
            "n_dropped": int(seq["store"].n_dropped),
            "log_frames_lost": int(seq["log"].n_lost),
            "n_track_ids": int(seq["store"].next_id),
        }
        if warn and (report["n_dropped"] or report["log_frames_lost"]):
            import logging

            logging.getLogger("OdamPipeline").warning(
                "capacity overflow: %s", report
            )
        return report

    # -------------------------------------------------------------- mapping
    def optim_process(self, tracks: list[np.ndarray]) -> dict:
        """Multi-view superquadric optimization over all tracks
        (processor.py:352-368 -> run_multi_view.py:22-76, prior hardcoded
        True there; here it follows cfg.use_prior)."""
        seq = self.sequence
        cfg = self.cfg
        sc = constraints.build_scene_constraints(
            tracks, np.asarray(seq["usable_frames"]), np.asarray(seq["P_cws"]),
            seq["img_h"], seq["img_w"], cfg.max_objs, cfg.max_views,
            cfg.min_views, robust_init=cfg.robust_init,
        )
        init = sq.init_params(
            jnp.asarray(sc.init_translate), jnp.asarray(sc.init_angle),
            jnp.asarray(sc.init_dims), cfg.representation,
        )
        solver_args = (
            init, jnp.asarray(sc.boxes), jnp.asarray(sc.box_mask),
            jnp.asarray(sc.view_mask), jnp.asarray(sc.P_cw),
            jnp.asarray(sc.optimize_mask),
            jnp.asarray(prior.prior_invcov_for_classes(sc.obj_class)),
        )
        if cfg.optim_solver == "lm":
            from ..mapping import lm_solver

            # LM with automatic Adam fallback for out-of-envelope objects
            # (heavily border-masked edges / near-degenerate aspect —
            # see lm_solver.lm_envelope_ok).
            res = lm_solver.optimize_superquadrics_auto(
                *solver_args,
                n_iters=min(cfg.optim_iters, 40), n_samples=cfg.optim_samples,
                adam_iters=cfg.optim_iters,
                representation=cfg.representation, use_prior=cfg.use_prior,
            )
        else:
            res = optimizer.optimize_superquadrics(
                *solver_args,
                n_iters=cfg.optim_iters, n_samples=cfg.optim_samples,
                representation=cfg.representation, use_prior=cfg.use_prior,
            )
        n_objs = int(sc.obj_valid.sum())
        corners = np.asarray(res.corners)
        corners_dl = np.asarray(res.corners_detector)
        params = jax.tree.map(np.asarray, res.params)
        # Reorder back to input track order (constraints sorted longest-first).
        order = np.argsort([-len(t) for t in tracks], kind="stable")[: sc.boxes.shape[0]]
        inv = {int(t): s for s, t in enumerate(order)}
        out_tracks, bboxes_qc, bboxes_dl, quadrics = [], [], [], []
        for t_idx in range(len(tracks)):
            if t_idx not in inv or inv[t_idx] >= n_objs:
                continue
            s = inv[t_idx]
            out_tracks.append(tracks[t_idx])
            bboxes_qc.append(corners[s])
            bboxes_dl.append(corners_dl[s])
            quadrics.append(
                sq.SQParams(*[np.asarray(leaf[s]) for leaf in params])
            )
        return {
            "tracks": out_tracks,
            "bboxes_qc": bboxes_qc,
            "bboxes_dl": bboxes_dl,
            "quadrics": quadrics,
        }

    def merge_process(self, data: dict) -> list[np.ndarray]:
        """Fuse fragmented tracks (processor.py:347-350 -> run_merge.py)."""
        return merge.merge_tracks(
            data["tracks"], data["bboxes_qc"],
            np.asarray(self.sequence["usable_frames"]),
        )

    # ---------------------------------------------------------- checkpoints
    def save_sequence_state(self, path: str) -> None:
        """Checkpoint mid-scene pipeline state (track store + observation log
        + host metadata) so a crashed run resumes mid-sequence — a capability
        the reference lacks (SURVEY.md §5: "pipeline state is never
        checkpointed mid-scene")."""
        import pickle

        seq = self.sequence
        state = {
            "K": seq["K"],
            "img_h": seq["img_h"],
            "img_w": seq["img_w"],
            "store": jax.tree.map(np.asarray, seq["store"]),
            "log": jax.tree.map(np.asarray, seq["log"]),
            "usable_frames": seq["usable_frames"],
            "T_wcs": seq["T_wcs"],
            "P_cws": seq["P_cws"],
            "history": seq["history"],
            "frames_in_log": seq["frames_in_log"],
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def restore_sequence_state(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.init_sequence(state["K"], state["img_h"], state["img_w"])
        seq = self.sequence
        seq["store"] = tracker.TrackStore(
            *[jnp.asarray(x) for x in state["store"]]
        )
        seq["log"] = tracker.FrameLog(*[jnp.asarray(x) for x in state["log"]])
        seq["usable_frames"] = list(state["usable_frames"])
        seq["T_wcs"] = list(state["T_wcs"])
        seq["P_cws"] = list(state["P_cws"])
        seq["history"] = dict(state.get("history", {}))
        seq["frames_in_log"] = int(state.get("frames_in_log", len(seq["usable_frames"])))
