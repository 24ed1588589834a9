"""Offline (batched-detection) execution mode tests, incl. dp-mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod, detr as detr_mod
from odam_tpu.parallel import mesh as mesh_mod
from odam_tpu.runtime import offline, processor as proc_mod

TINY = detr_mod.DETRConfig(
    num_classes=8, num_queries=8, hidden_dim=32, nheads=4,
    enc_layers=1, dec_layers=1, dim_feedforward=32, aux_loss=False,
)
TINY_ASSOC = assoc_mod.AssociatorConfig(
    descriptor_dim=32, keypoint_encoder=(78, 32, 32),
    gnn_layers=("self", "cross"), self_gnn_layers=("self",),
    sinkhorn_iterations=10,
)


def _models():
    detr = detr_mod.DETR(TINY)
    dparams = detr.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    assoc = assoc_mod.Associator(TINY_ASSOC)
    T, W, N = 8, 6, 5
    aparams = assoc.init(
        jax.random.key(1),
        jnp.full((1, T, W, 79), -1.0), jnp.zeros((1, T), bool),
        jnp.full((1, N, 79), -1.0), jnp.zeros((1, N), bool),
    )
    cfg = proc_mod.PipelineConfig(
        detect_threshold=0.0, score_threshold=0.0, max_tracks=T, max_dets=N,
        window=W, track_bbox_samples=64, optim_iters=4, optim_samples=64,
        min_views=1, max_objs=T, max_views=16, max_log_frames=32,
    )
    return detr, dparams, assoc, aparams, cfg


def test_batched_detector_pads_partial_batches():
    detr, dparams, _, _, cfg = _models()
    det = offline.BatchedDetector(detr, dparams, cfg, batch_size=4)
    frames = [np.zeros((64, 64, 3), np.float32)] * 6  # 1.5 batches
    K = np.eye(3, dtype=np.float32) * 100
    out = det.detect_frames(frames, K, 64.0, 64.0)
    assert len(out) == 6
    assert out[0].valid.shape == (1, cfg.max_dets)


def test_batched_detector_dp_mesh():
    detr, dparams, _, _, cfg = _models()
    mesh = mesh_mod.make_mesh({"dp": 8})
    det = offline.BatchedDetector(detr, dparams, cfg, batch_size=8, mesh=mesh)
    frames = [np.zeros((64, 64, 3), np.float32)] * 8
    K = np.eye(3, dtype=np.float32) * 100
    out = det.detect_frames(frames, K, 64.0, 64.0)
    assert len(out) == 8


def test_offline_scene_matches_online_structure(rng):
    """Offline (batched detect + cached association) produces the same
    track structure as the online pipeline on identical inputs."""
    detr, dparams, assoc, aparams, cfg = _models()

    K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    frames, fids, poses = [], [], []
    for f in range(5):
        frames.append(rng.normal(size=(64, 64, 3)).astype(np.float32))
        fids.append(f)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * f, 0, 0]
        poses.append(T)

    online = proc_mod.OdamPipeline(detr, dparams, assoc, aparams, cfg)
    online.init_sequence(K, 64, 64)
    for img, f, T in zip(frames, fids, poses):
        online.process_frame(img, f, T)
    online_tracks = online.tracks

    det = offline.BatchedDetector(detr, dparams, cfg, batch_size=2)
    cached = offline.CachedDetectionPipeline(assoc, aparams, cfg)
    cached.init_sequence(K, 64, 64)
    for d, f, T in zip(det.detect_frames(frames, K, 64.0, 64.0), fids, poses):
        cached.process_detections(d, f, T)
    offline_tracks = cached.tracks

    assert len(online_tracks) == len(offline_tracks)
    for a, b in zip(online_tracks, offline_tracks):
        np.testing.assert_allclose(a, b, atol=1e-4)

    out = offline.run_scene_offline(
        det, offline.CachedDetectionPipeline(assoc, aparams, cfg),
        frames, fids, poses, K, 64.0, 64.0,
    )
    assert set(out) == {"tracks", "bboxes_qc", "bboxes_dl", "quadrics"}
