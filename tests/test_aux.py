"""Tests for auxiliary components: quadric algebra, heuristic tracker,
visualization export, offline association eval, pallas attention parity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odam_tpu.mapping import quadric, quadric_algebra as qa, superquadric as sq
from odam_tpu.runtime.heuristic_tracker import HeuristicTracker, detect_keypoints
from odam_tpu.utils import geometry as geo, visualization as viz


def test_quadric_vector_roundtrip(rng):
    Q = rng.normal(size=(4, 4))
    Q = (Q + Q.T) / 2
    np.testing.assert_allclose(qa.vector_to_quadric(qa.quadric_to_vector(Q)), Q)


def test_plane_constraint_vector_consistency(rng):
    """row . vec(Q) must equal pi^T Q pi for symmetric Q."""
    Q = rng.normal(size=(4, 4))
    Q = (Q + Q.T) / 2
    p = rng.normal(size=4)
    lhs = qa.plane_constraint_vector(p) @ qa.quadric_to_vector(Q)
    np.testing.assert_allclose(lhs, p @ Q @ p, rtol=1e-9)


def test_quadric_from_planes_svd_recovers_sphere():
    """Tangent planes of a unit sphere at origin -> recovered dual quadric
    proportional to diag(1, 1, 1, -1)."""
    planes = []
    rng = np.random.default_rng(0)
    for _ in range(24):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        planes.append(np.array([n[0], n[1], n[2], -1.0]))  # tangent to unit sphere
    Q = qa.quadric_from_planes_svd(planes)
    Q = Q / -Q[3, 3]
    np.testing.assert_allclose(Q, np.diag([1.0, 1, 1, -1]), atol=1e-6)


def test_aabb_face_planes():
    corners = np.asarray(
        geo.box3d_corners(jnp.array([2.0, 2.0, 2.0]), jnp.asarray(0.0), jnp.zeros(3))
    )
    planes = qa.aabb_face_planes(corners)
    assert len(planes) == 6
    # every corner lies on exactly 3 planes
    for c in corners:
        on = sum(abs(p[:3] @ c + p[3]) < 1e-6 for p in planes)
        assert on == 3


def test_depth_bound_planes():
    pts = np.array([[0, 0, 2.0], [0, 0, 4.0], [1, 1, 3.0]])
    T_wc = np.eye(4)
    lo, hi = qa.depth_bound_planes(pts, T_wc)
    # points at min depth satisfy the min plane equation
    np.testing.assert_allclose(lo[:3] @ pts[0] + lo[3], 0.0, atol=1e-9)
    np.testing.assert_allclose(hi[:3] @ pts[1] + hi[3], 0.0, atol=1e-9)


# ------------------------------------------------------------------ tracker

def _det(cls, box, t_co, score=0.9, dims=(1.0, 1.0, 1.0)):
    return {"cls": cls, "box": np.asarray(box, float), "dims": np.asarray(dims),
            "t_co": np.asarray(t_co, float), "score": score}


def test_heuristic_tracker_continuity():
    tr = HeuristicTracker()
    T_wc = np.eye(4)
    for f in range(5):
        tr.step([_det(3, [100 + 2 * f, 100, 200 + 2 * f, 200], [0.05 * f, 0, 2])], f, T_wc)
    tracks = tr.export_tracks()
    assert len(tracks) == 1
    assert len(tracks[0]) == 5


def test_heuristic_tracker_class_gate_and_new_tracks():
    tr = HeuristicTracker()
    T_wc = np.eye(4)
    tr.step([_det(3, [100, 100, 200, 200], [0, 0, 2])], 0, T_wc)
    # same box, different class -> new track
    tr.step([_det(4, [100, 100, 200, 200], [0, 0, 2])], 1, T_wc)
    assert len(tr.export_tracks()) == 2


def test_heuristic_tracker_3d_fallback_after_gap():
    tr = HeuristicTracker(max_gap=5)
    T_wc = np.eye(4)
    tr.step([_det(3, [100, 100, 200, 200], [0, 0, 2])], 0, T_wc)
    tr.step([], 7, T_wc)  # gap: track goes stale
    assert 0 in tr.inactive
    # 8 frames later, different 2D box but same 3D position -> 3D IoU match
    tr.step([_det(3, [400, 300, 500, 400], [0.05, 0, 2])], 8, T_wc)
    tracks = tr.export_tracks()
    assert len(tracks) == 1 and len(tracks[0]) == 2


def test_heuristic_tracker_depth_points():
    tr = HeuristicTracker()
    T_wc = np.eye(4)
    img = np.zeros((120, 160, 3), np.uint8)
    depth = np.full((60, 80), 2.0, np.float32)
    K_d = np.array([[50.0, 0, 40], [0, 50, 30], [0, 0, 1]])
    tr.step([_det(3, [40, 30, 120, 90], [0, 0, 2])], 0, T_wc, img, depth, K_d)
    assert tr.tracks[0].points is not None and len(tr.tracks[0].points) > 0
    # second frame: point containment match keeps the track
    tr.step([_det(3, [42, 32, 122, 92], [0, 0, 2])], 1, T_wc, img, depth, K_d)
    assert len(tr.export_tracks()) == 1
    assert len(tr.tracks[0].rows) == 2


def test_detect_keypoints_grid_fallback():
    img = np.zeros((64, 64, 3), np.uint8)
    kps = detect_keypoints(img)
    assert len(kps) > 0 and kps.shape[1] == 2


# ------------------------------------------------------------------- viz

def test_sq_mesh_export(tmp_path):
    params = sq.SQParams(
        translate=np.array([1.0, 0.0, 0.5], np.float32),
        angle=np.asarray(0.3, np.float32),
        scales=np.array([0.7, 0.7, 0.9], np.float32),
        shapes=np.zeros(2, np.float32),
    )
    v, f = viz.sq_surface_mesh(params, grid=12)
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert f.max() < len(v)
    path = str(tmp_path / "scene.obj")
    viz.export_scene_obj(path, [params, params], grid=8)
    text = open(path).read()
    assert text.count("v ") > 0 and text.count("f ") > 0


def test_detection_snapshot(tmp_path):
    pytest.importorskip("matplotlib")
    path = str(tmp_path / "snap.png")
    viz.save_detection_snapshot(
        path, np.zeros((64, 64, 3), np.uint8),
        np.array([[5, 5, 30, 30]]), labels=["chair"], scores=[0.9],
    )
    assert os.path.getsize(path) > 0


def test_matching_snapshot_and_loss_plot(tmp_path):
    pytest.importorskip("matplotlib")
    p1 = str(tmp_path / "match.png")
    viz.save_matching_snapshot(
        p1, np.zeros((64, 64, 3), np.uint8),
        np.array([[5, 5, 30, 30]]),
        np.array([[6, 6, 31, 31], [40, 40, 60, 60]]),
        np.array([0, -1]),
    )
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "loss.png")
    viz.plot_loss(p2, [3.0, 2.0, 1.5])
    assert os.path.getsize(p2) > 0


# ------------------------------------------------------- association eval

def test_association_eval_perfect_matcher():
    """A mock 'model' that returns identity matches scores P/R/F1 = 1."""
    from odam_tpu.eval import association

    class FakeOut:
        def __init__(self, matches):
            self.matches = matches

    class FakeModel:
        def apply(self, params, tracks, tm, dets, dm, thr):
            # identity: detection d matches track d (test tracks are aligned)
            n = dets.shape[1]
            pred = np.where(np.asarray(dm[0]), np.arange(n), -1)
            return FakeOut(matches=pred[None])

    tracks = []
    for t in range(3):
        rows = np.full((6, 82), -1.0, np.float32)
        rows[:, 0] = np.arange(6)
        rows[:, 1] = t
        tracks.append(rows)
    m = association.evaluate_scene(FakeModel(), None, tracks, max_tracks=8, max_dets=4)
    assert m.n_frames == 5
    assert m.precision == 1.0 and m.recall == 1.0 and m.f1 == 1.0


# -------------------------------------------------------- pallas attention

def test_flash_attention_matches_reference():
    """Streaming (blockwise online-softmax) attention == dense attention."""
    from odam_tpu.ops import pallas_attention
    from odam_tpu.ops.attention import mha_core

    rng = np.random.default_rng(1)
    B, Lq, Lk, H, dh = 1, 8, 300, 2, 16  # Lk spans multiple KV blocks + padding
    q = jnp.asarray(rng.normal(size=(B, Lq, H * dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
    kpm = np.zeros((B, Lk), bool)
    kpm[:, -7:] = True
    ref = mha_core(q, k, v, H, jnp.asarray(kpm))
    out = pallas_attention.flash_attention(
        q.reshape(B, Lq, H, dh), k.reshape(B, Lk, H, dh), v.reshape(B, Lk, H, dh),
        jnp.asarray(kpm), block_k=128, interpret=True,
    ).reshape(B, Lq, H * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_mha_core_routes_long_windows_to_flash(monkeypatch):
    """use_pallas=True must route key sequences >= FLASH_MIN_KEYS through
    the streaming flash kernel (the long-track-window fuser path, lifting
    the reference's 100-step bound, processor.py:133) and shorter ones
    through the single-tile fused kernel — with identical numerics.
    Batched calls (B > PALLAS_MAX_BATCH) take the XLA path: measured on
    hardware, XLA's fusion beats the hand kernels at every batched shape
    (profile_batched_detector.py --pallas off: 434 vs 347 fps at B=32)."""
    from odam_tpu.ops import attention, pallas_attention

    calls = []
    orig_flash = pallas_attention.flash_attention
    orig_fused = pallas_attention.fused_attention
    monkeypatch.setattr(
        pallas_attention, "flash_attention",
        lambda *a, **k: calls.append("flash") or orig_flash(*a, **k))
    monkeypatch.setattr(
        pallas_attention, "fused_attention",
        lambda *a, **k: calls.append("fused") or orig_fused(*a, **k))

    rng = np.random.default_rng(2)
    H, dh = 2, 16
    for Lk, expect in ((400, "flash"), (100, "fused")):
        B, Lq = 2, Lk
        q = jnp.asarray(rng.normal(size=(B, Lq, H * dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
        kpm = np.zeros((B, Lk), bool)
        kpm[:, -9:] = True
        ref = attention.mha_core(q, k, v, H, jnp.asarray(kpm))
        calls.clear()
        out = attention.mha_core(q, k, v, H, jnp.asarray(kpm), use_pallas=True)
        assert calls == [expect], (Lk, calls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    # Batched (throughput-mode) calls must NOT take the Pallas kernels.
    B = attention.PALLAS_MAX_BATCH + 1
    q = jnp.asarray(rng.normal(size=(B, 16, H * dh)).astype(np.float32))
    calls.clear()
    out = attention.mha_core(q, q, q, H, None, use_pallas=True)
    assert calls == [], calls
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(attention.mha_core(q, q, q, H, None)),
        atol=3e-5)


def test_associator_long_window_with_pallas_fuser():
    """A window-400 associator (the flash-kernel consumer) runs end to end
    with use_pallas=True (interpret mode on CPU) and matches the XLA path."""
    import dataclasses

    from odam_tpu.models.associator import Associator, AssociatorConfig

    cfg = AssociatorConfig(
        descriptor_dim=32, keypoint_encoder=(78, 32, 32),
        gnn_layers=("self", "cross"), self_gnn_layers=("self",),
        sinkhorn_iterations=10, num_heads=2,
    )
    rng = np.random.default_rng(3)
    T, W, N = 2, 400, 5
    tracks = jnp.asarray(
        np.where(
            np.arange(W)[None, None, :, None] < 350,
            rng.normal(size=(1, T, W, 79)) * 0.3, -1.0
        ).astype(np.float32)
    )
    dets = jnp.asarray(rng.normal(size=(1, N, 79)).astype(np.float32) * 0.3)
    tm = jnp.ones((1, T), bool)
    dm = jnp.ones((1, N), bool)

    model = Associator(cfg)
    params = model.init(jax.random.key(0), tracks, tm, dets, dm)
    out_xla = model.apply(params, tracks, tm, dets, dm)

    model_p = Associator(dataclasses.replace(cfg, use_pallas=True))
    out_pallas = model_p.apply(params, tracks, tm, dets, dm)
    np.testing.assert_allclose(
        np.asarray(out_pallas.log_assignment),
        np.asarray(out_xla.log_assignment), atol=5e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out_pallas.matches), np.asarray(out_xla.matches)
    )


def test_pallas_attention_matches_reference():
    from odam_tpu.ops import pallas_attention
    from odam_tpu.ops.attention import mha_core

    rng = np.random.default_rng(0)
    B, Lq, Lk, H, dh = 2, 16, 24, 4, 8
    q = jnp.asarray(rng.normal(size=(B, Lq, H * dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Lk, H * dh)).astype(np.float32))
    kpm = np.zeros((B, Lk), bool)
    kpm[:, -5:] = True
    ref = mha_core(q, k, v, H, jnp.asarray(kpm))
    out = pallas_attention.fused_attention(
        q.reshape(B, Lq, H, dh), k.reshape(B, Lk, H, dh), v.reshape(B, Lk, H, dh),
        jnp.asarray(kpm), interpret=True,
    ).reshape(B, Lq, H * dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_checkpoint_save_is_crash_safe(tmp_path):
    """A save interrupted after the old checkpoint was displaced must leave a
    restorable state (.bak fallback) — orbax force=True alone deletes the
    destination first, losing everything on a mid-save crash."""
    import os

    import jax.numpy as jnp

    from odam_tpu.utils import checkpoint

    path = str(tmp_path / "ckpt")
    tree1 = {"w": jnp.ones((3,))}
    tree2 = {"w": jnp.full((3,), 2.0)}
    checkpoint.save(path, tree1)
    assert checkpoint.latest_path(path) == path
    checkpoint.save(path, tree2)
    out = checkpoint.restore(path, tree1)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0)

    # simulate a crash between the two renames: main dir gone, .bak present
    os.rename(path, path + ".bak2")  # clear main
    import shutil
    shutil.rmtree(path + ".bak", ignore_errors=True)
    os.rename(path + ".bak2", path + ".bak")
    assert checkpoint.latest_path(path) == path + ".bak"
    out = checkpoint.restore(path, tree1)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0)


def test_checkpoint_latest_path_tmp_ordering(tmp_path):
    """A committed .tmp (crash between the full write and the rename swap) is
    NEWER than .bak and must win; an uncommitted .tmp (crash mid-write) must
    be skipped entirely, never handed to orbax restore."""
    import os
    import shutil

    import jax.numpy as jnp

    from odam_tpu.utils import checkpoint

    path = str(tmp_path / "ckpt")
    checkpoint.save(path, {"w": jnp.ones((3,))})     # old state
    checkpoint.save(path + "_new", {"w": jnp.full((3,), 5.0)})  # new state

    # Simulate: save(tree_new) fully wrote .tmp, displaced main -> .bak,
    # then crashed before renaming .tmp -> main.
    os.rename(path, path + ".bak")
    os.rename(path + "_new", path + ".tmp")
    assert checkpoint.latest_path(path) == path + ".tmp"
    out = checkpoint.restore(path, {"w": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(out["w"]), 5.0)

    # Simulate: the .tmp write itself was interrupted (no commit marker) —
    # fall back to .bak, and never return the truncated dir.
    os.remove(os.path.join(path + ".tmp", "_CHECKPOINT_METADATA"))
    assert checkpoint.latest_path(path) == path + ".bak"
    out = checkpoint.restore(path, {"w": jnp.zeros((3,))})
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)

    # First-ever save interrupted: only an uncommitted .tmp exists -> None.
    shutil.rmtree(path + ".bak")
    assert checkpoint.latest_path(path) is None
