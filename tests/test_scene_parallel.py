"""Scene-parallel val-split execution (runtime/scene_parallel.py).

Runs P scenes concurrently — one per device of the 8-virtual-device CPU
mesh — through the vmapped online per-frame step, and asserts the result is
identical to the serial OdamPipeline run scene by scene (SURVEY.md §2 DP
plan; the reference's serial loop is run_processor.py:46-92).

Uses the table-driven detector stub + oracle associator pattern from
test_integration.py, extended with a scene axis: decisions are decisive
(well-separated objects), so serial/parallel equality is exact up to float
noise rather than sensitive to tie-breaking.
"""
import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod
from odam_tpu.runtime import processor as proc_mod, scene_parallel
from odam_tpu.utils import geometry as geo

K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
IMG_H, IMG_W = 240, 320
NUM_CLASSES = 8
Q = 8
N_SCENES = 8


def _look_at(cam, target):
    fwd = target - cam
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, cam
    return T


def _scene_objects(s):
    """2-3 objects per scene, laid out differently per scene index."""
    base = [
        (np.array([0.0 + 0.2 * s, 0.0, 0.5]), np.array([0.6, 0.6, 1.0]),
         20.0 + 10 * s, (2 * s) % 8),
        (np.array([1.6, 0.3 - 0.1 * s, 0.4]), np.array([1.1, 0.7, 0.8]),
         140.0 - 7 * s, (2 * s + 3) % 8),
    ]
    if s % 2 == 0:
        base.append(
            (np.array([-0.5, 1.4, 0.3]), np.array([0.5, 0.4, 0.6]),
             float(11 * s % 170), (s + 5) % 8)
        )
    return base


def _n_frames(s):
    return 10 + (s % 4) * 2  # ragged lengths: 10/12/14/16


def _build_all_scenes(rng):
    """Stub tables with a [scene, frame] leading layout + per-scene metadata."""
    F_max = max(_n_frames(s) for s in range(N_SCENES))
    S = N_SCENES
    logits = np.full((S, F_max, Q, NUM_CLASSES + 1), -8.0, np.float32)
    logits[..., -1] = 8.0
    boxes = np.full((S, F_max, Q, 4), 0.5, np.float32)
    offsets = np.zeros((S, F_max, Q, 2), np.float32)
    sizes = np.ones((S, F_max, Q, 3), np.float32)
    depths = np.ones((S, F_max, Q, 1), np.float32)
    angles = np.zeros((S, F_max, Q, 30), np.float32)
    scenes = []
    for s in range(S):
        objects = _scene_objects(s)
        center = np.mean([o[0] for o in objects], axis=0)
        n_frames = _n_frames(s)
        frames, fids, T_wcs = [], [], []
        for f in range(n_frames):
            phi = 2 * np.pi * f / n_frames
            cam = center + 4.0 * np.array([np.cos(phi), np.sin(phi), 0.35])
            T_wc = _look_at(cam, center).astype(np.float32)
            T_wcs.append(T_wc)
            fids.append(f)
            img = np.zeros((IMG_H, IMG_W, 3), np.float32)
            img[0, 0, 0] = f
            img[0, 0, 1] = s
            frames.append(img)
            T_cw = np.linalg.inv(T_wc)
            for q, (c, dims, yaw_deg, cls) in enumerate(objects):
                corners = np.asarray(geo.box3d_corners(
                    jnp.asarray(dims), jnp.asarray(np.deg2rad(yaw_deg)),
                    jnp.asarray(c)))
                pc = corners @ T_cw[:3, :3].T + T_cw[:3, 3]
                uv = pc @ K.T
                uv = uv[:, :2] / uv[:, 2:]
                box = np.array([uv[:, 0].min(), uv[:, 1].min(),
                                uv[:, 0].max(), uv[:, 1].max()])
                box += rng.normal(0, 0.8, 4)
                if (box[0] < -20 or box[1] < -20 or box[2] > IMG_W + 20
                        or box[3] > IMG_H + 20):
                    continue
                t_co = T_cw[:3, :3] @ c + T_cw[:3, 3]
                if t_co[2] < 0.6:
                    continue
                logits[s, f, q, :] = -8.0
                logits[s, f, q, cls] = 8.0
                cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
                boxes[s, f, q] = [cx / IMG_W, cy / IMG_H,
                                  (box[2] - box[0]) / IMG_W,
                                  (box[3] - box[1]) / IMG_H]
                proj = K @ t_co
                sc = proj[:2] / proj[2]
                offsets[s, f, q] = [(sc[0] - cx) / IMG_W, (sc[1] - cy) / IMG_H]
                depths[s, f, q] = t_co[2]
                sizes[s, f, q] = dims * rng.uniform(0.95, 1.05, 3)
                cam_azi = np.degrees(float(geo.camera_azimuth(jnp.asarray(T_wc))))
                azi_co = (yaw_deg - cam_azi) % 180.0
                angles[s, f, q, int(azi_co // 6) % 30] = 10.0
        scenes.append({"frames": frames, "frame_ids": fids, "T_wcs": T_wcs,
                       "K": K, "objects": objects})
    tables = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "pred_offset": jnp.asarray(offsets),
        "pred_size": jnp.asarray(sizes),
        "pred_depth": jnp.asarray(depths),
        "pred_angle": jnp.asarray(angles),
    }
    return tables, scenes


class SceneStubDetector:
    """Table stub reading (frame, scene) indices from pixels (0,0,0)/(0,0,1)."""

    def apply(self, params, image):
        f = image[0, 0, 0, 0].astype(jnp.int32)
        s = image[0, 0, 0, 1].astype(jnp.int32)
        out = {k: v[s, f][None] for k, v in params.items()}
        out["pred_obj_features"] = jnp.zeros((1, Q, 8))
        return out


class OracleAssociator:
    """Nearest-3D-center matcher (same as test_integration.py)."""

    def apply(self, params, tracks79, track_mask, det79, det_mask, thr):
        t = tracks79[0]
        valid = t[..., 0] >= 0
        w = valid.astype(jnp.float32)[..., None]
        centers = jnp.sum(t[..., 9:12] * w, axis=1) / jnp.maximum(w.sum(1), 1)
        d_centers = det79[0][:, 9:12]
        dist = jnp.linalg.norm(centers[:, None] - d_centers[None], axis=-1)
        T, N = dist.shape
        dist = jnp.where(track_mask[0][:, None] & det_mask[0][None, :], dist, 1e6)
        match_of_det = jnp.argmin(dist, axis=0)
        ok = dist[match_of_det, jnp.arange(N)] < 0.6
        matches = jnp.where(det_mask[0] & ok, match_of_det, -1)
        Z = jnp.full((T + 1, N + 1), -20.0)
        Z = Z.at[T, :].set(0.0)
        Z = Z.at[jnp.where(matches >= 0, matches, T), jnp.arange(N)].set(0.0)
        return assoc_mod.AssociatorOutput(
            log_assignment=Z[None], scores=-dist[None], matches=matches[None]
        )


def _cfg():
    return proc_mod.PipelineConfig(
        detect_threshold=0.5, score_threshold=0.8, max_tracks=8, max_dets=Q,
        window=8, track_bbox_samples=128, optim_iters=80, optim_samples=256,
        min_views=4, max_objs=8, max_views=32, max_log_frames=32,
    )


def test_scene_parallel_matches_serial(rng):
    from odam_tpu.parallel import mesh as mesh_mod

    tables, scenes = _build_all_scenes(rng)
    cfg = _cfg()

    # ---- serial reference: one scene at a time through OdamPipeline
    serial_tracks, serial_outs = [], []
    pipe = proc_mod.OdamPipeline(SceneStubDetector(), tables,
                                 OracleAssociator(), {}, cfg)
    for s in scenes:
        pipe.init_sequence(s["K"], IMG_H, IMG_W)
        for img, fid, T_wc in zip(s["frames"], s["frame_ids"], s["T_wcs"]):
            pipe.process_frame(img, fid, T_wc)
        tracks = pipe.tracks
        serial_tracks.append([np.asarray(t) for t in tracks])
        out = pipe.optim_process(tracks)
        merged = pipe.merge_process(out)
        serial_outs.append(pipe.optim_process(merged))

    # ---- parallel: all 8 scenes at once over the 8-device mesh
    n_dev = min(len(jax.devices()), N_SCENES)
    assert n_dev == N_SCENES, "conftest must provide 8 virtual devices"
    mesh = mesh_mod.make_mesh({"dp": n_dev})
    runner = scene_parallel.SceneParallelRunner(
        SceneStubDetector(), tables, OracleAssociator(), {}, cfg, mesh
    )
    par_outs = runner.run_scenes(scenes, IMG_H, IMG_W)

    assert len(par_outs) == len(scenes)
    for s_idx, (ser_t, ser_o, par_o) in enumerate(
        zip(serial_tracks, serial_outs, par_outs)
    ):
        par_t = par_o["tracks"]
        # merged outputs: same final track structure...
        assert len(ser_o["tracks"]) == len(par_t), (
            s_idx, len(ser_o["tracks"]), len(par_t))
        for a, b in zip(ser_o["tracks"], par_t):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-5)
        # ... and matching mapped boxes
        for a, b in zip(ser_o["bboxes_qc"], par_o["bboxes_qc"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)
        # every GT object recovered as one track
        assert len(par_t) == len(scenes[s_idx]["objects"])


def test_lanes_exceed_mesh(rng):
    """S lanes > mesh devices: lanes are a vmap axis, so a 2-device mesh
    runs 8 scenes as 4 batched per device — the single-chip throughput
    mode (scripts/bench_scene_parallel.py).  Results must be identical to
    the one-scene-per-device run."""
    from odam_tpu.parallel import mesh as mesh_mod

    tables, scenes = _build_all_scenes(rng)
    cfg = _cfg()

    mesh8 = mesh_mod.make_mesh({"dp": N_SCENES})
    ref = scene_parallel.SceneParallelRunner(
        SceneStubDetector(), tables, OracleAssociator(), {}, cfg, mesh8
    ).run_scenes(scenes, IMG_H, IMG_W)

    mesh2 = mesh_mod.make_mesh({"dp": 2}, devices=jax.devices()[:2])
    runner = scene_parallel.SceneParallelRunner(
        SceneStubDetector(), tables, OracleAssociator(), {}, cfg, mesh2,
        n_lanes=N_SCENES,
    )
    outs = runner.run_scenes(scenes, IMG_H, IMG_W)

    assert len(outs) == len(ref)
    for a, b in zip(ref, outs):
        assert len(a["tracks"]) == len(b["tracks"])
        for ta, tb in zip(a["tracks"], b["tracks"]):
            np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                       atol=1e-4, rtol=1e-5)
        for ba, bb in zip(a["bboxes_qc"], b["bboxes_qc"]):
            np.testing.assert_allclose(np.asarray(ba), np.asarray(bb),
                                       atol=5e-3)
