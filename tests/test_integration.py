"""End-to-end pipeline integration on a synthetic scene (SURVEY.md §4:
"tiny synthetic scene, known boxes + known poses -> detector stub").

A table-driven detector stub feeds ground-truth detections (with noise)
through the *real* pipeline step — postprocess/NMS, detection-row assembly,
world lift, track store, constraint building, superquadric optimization,
merge — with an oracle associator that matches by 3D center distance.
Verifies track continuity and final oriented-3D-IoU against ground truth.
"""
import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod
from odam_tpu.runtime import processor as proc_mod
from odam_tpu.utils import geometry as geo, host_boxes

K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
IMG_H, IMG_W = 240, 320
N_FRAMES = 24
NUM_CLASSES = 8
Q = 8  # query slots in the stub


def _look_at(cam, target):
    fwd = target - cam
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 0.0, 1.0])
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, cam
    return T


OBJECTS = [  # center, dims, yaw_deg(in [0,180)), class
    (np.array([0.0, 0.0, 0.5]), np.array([0.6, 0.6, 1.0]), 24.0, 5),
    (np.array([1.8, 0.3, 0.4]), np.array([1.2, 0.7, 0.8]), 150.0, 1),
    (np.array([-0.5, 1.5, 0.3]), np.array([0.5, 0.4, 0.6]), 90.0, 3),
]


def _build_scene(rng):
    """Per-frame DETR-style output tables + poses."""
    logits = np.full((N_FRAMES, Q, NUM_CLASSES + 1), -8.0, np.float32)
    logits[:, :, -1] = 8.0  # default: no-object
    boxes = np.full((N_FRAMES, Q, 4), 0.5, np.float32)
    offsets = np.zeros((N_FRAMES, Q, 2), np.float32)
    sizes = np.ones((N_FRAMES, Q, 3), np.float32)
    depths = np.ones((N_FRAMES, Q, 1), np.float32)
    angles = np.zeros((N_FRAMES, Q, 30), np.float32)
    T_wcs = []
    center = np.array([0.4, 0.6, 0.5])
    for f in range(N_FRAMES):
        phi = 2 * np.pi * f / N_FRAMES
        cam = center + 4.0 * np.array([np.cos(phi), np.sin(phi), 0.35])
        T_wc = _look_at(cam, center).astype(np.float32)
        T_wcs.append(T_wc)
        T_cw = np.linalg.inv(T_wc)
        for q, (c, dims, yaw_deg, cls) in enumerate(OBJECTS):
            corners = np.asarray(
                geo.box3d_corners(
                    jnp.asarray(dims), jnp.asarray(np.deg2rad(yaw_deg)), jnp.asarray(c)
                )
            )
            pc = corners @ T_cw[:3, :3].T + T_cw[:3, 3]
            uv = (pc @ K.T)
            uv = uv[:, :2] / uv[:, 2:]
            box = np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])
            box += rng.normal(0, 0.8, 4)
            if box[0] < -20 or box[1] < -20 or box[2] > IMG_W + 20 or box[3] > IMG_H + 20:
                continue  # object out of frame: leave slot as no-object
            t_co = T_cw[:3, :3] @ c + T_cw[:3, 3]
            if t_co[2] < 0.6:
                continue
            logits[f, q, :] = -8.0
            logits[f, q, cls] = 8.0
            cx, cy = (box[0] + box[2]) / 2, (box[1] + box[3]) / 2
            boxes[f, q] = [cx / IMG_W, cy / IMG_H,
                           (box[2] - box[0]) / IMG_W, (box[3] - box[1]) / IMG_H]
            # offset so postprocess recovers t_co exactly:
            # shape_center = project(t_co); offset = (shape_center - box_center)/img
            proj = K @ t_co
            sc = proj[:2] / proj[2]
            offsets[f, q] = [(sc[0] - cx) / IMG_W, (sc[1] - cy) / IMG_H]
            depths[f, q] = t_co[2]
            sizes[f, q] = dims * rng.uniform(0.95, 1.05, 3)
            # azimuth must be given in the CAMERA frame (postprocess decodes
            # a camera-frame angle; the lift adds the camera azimuth back)
            cam_azi = np.degrees(
                float(geo.camera_azimuth(jnp.asarray(T_wc)))
            )
            azi_co = (yaw_deg - cam_azi) % 180.0
            angles[f, q, int(azi_co // 6) % 30] = 10.0
    tables = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "pred_offset": jnp.asarray(offsets),
        "pred_size": jnp.asarray(sizes),
        "pred_depth": jnp.asarray(depths),
        "pred_angle": jnp.asarray(angles),
    }
    return tables, T_wcs


class StubDetector:
    """Table-driven detector: reads the frame index from pixel (0, 0, 0)."""

    def apply(self, params, image):
        idx = jnp.clip(image[0, 0, 0, 0].astype(jnp.int32), 0, N_FRAMES - 1)
        out = {k: v[idx][None] for k, v in params.items()}
        out["pred_obj_features"] = jnp.zeros((1, Q, 8))
        return out


class OracleAssociator:
    """Matches detections to tracks by nearest 3D camera-frame center."""

    def apply(self, params, tracks79, track_mask, det79, det_mask, thr):
        # mean track center over valid window rows
        t = tracks79[0]            # [T, W, 79]
        valid = t[..., 0] >= 0     # real observations
        w = valid.astype(jnp.float32)[..., None]
        centers = jnp.sum(t[..., 9:12] * w, axis=1) / jnp.maximum(w.sum(1), 1)
        d_centers = det79[0][:, 9:12]  # [N, 3]
        dist = jnp.linalg.norm(centers[:, None] - d_centers[None], axis=-1)
        T, N = dist.shape
        big = 1e6
        dist = jnp.where(track_mask[0][:, None] & det_mask[0][None, :], dist, big)
        match_of_det = jnp.argmin(dist, axis=0)
        ok = dist[match_of_det, jnp.arange(N)] < 0.6
        matches = jnp.where(det_mask[0] & ok, match_of_det, -1)
        # log assignment: matched pairs + dustbin row get high probability
        Z = jnp.full((T + 1, N + 1), -20.0)
        Z = Z.at[T, :].set(0.0)  # confident dustbin for all unmatched
        Z = Z.at[jnp.where(matches >= 0, matches, T), jnp.arange(N)].set(0.0)
        return assoc_mod.AssociatorOutput(
            log_assignment=Z[None], scores=-dist[None], matches=matches[None]
        )


def test_full_pipeline_recovers_objects(rng):
    tables, T_wcs = _build_scene(rng)
    cfg = proc_mod.PipelineConfig(
        detect_threshold=0.5, score_threshold=0.8, max_tracks=8, max_dets=Q,
        window=16, track_bbox_samples=128, optim_iters=150, optim_samples=400,
        min_views=5, max_objs=8, max_views=32, max_log_frames=64,
    )
    pipe = proc_mod.OdamPipeline(StubDetector(), tables, OracleAssociator(), {}, cfg)
    pipe.init_sequence(K, IMG_H, IMG_W)

    for f in range(N_FRAMES):
        img = np.zeros((IMG_H, IMG_W, 3), np.float32)
        img[0, 0, 0] = f  # frame index channel for the stub
        pipe.process_frame(img, f, T_wcs[f])

    tracks = pipe.tracks
    assert len(tracks) == len(OBJECTS), [len(t) for t in tracks]
    # tracks are continuous: every object observed in most frames
    for t in tracks:
        assert len(t) >= N_FRAMES * 0.7, len(t)
        assert len(np.unique(t[:, 1])) == 1  # single class per track

    # world-frame translations near GT
    by_class = {cls: c for c, _, _, cls in OBJECTS}
    for t in tracks:
        cls = int(t[0, 1])
        np.testing.assert_allclose(
            t[:, 9:12].mean(0), by_class[cls], atol=0.15
        )

    out = pipe.optim_process(tracks)
    assert set(out) == {"tracks", "bboxes_qc", "bboxes_dl", "quadrics"}
    assert len(out["bboxes_qc"]) == len(OBJECTS)

    for track, corners in zip(out["tracks"], out["bboxes_qc"]):
        cls = int(np.median(track[:, 1]))
        gt = next(o for o in OBJECTS if o[3] == cls)
        gt_corners = np.asarray(
            geo.box3d_corners(
                jnp.asarray(gt[1]), jnp.asarray(np.deg2rad(gt[2])), jnp.asarray(gt[0])
            )
        )
        iou, _ = host_boxes.box3d_iou(np.asarray(corners, np.float64), gt_corners)
        assert iou > 0.55, (cls, iou)

    # merge is a no-op for well-separated objects
    merged = pipe.merge_process(out)
    assert len(merged) == len(OBJECTS)
