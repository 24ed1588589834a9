import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.models import associator as assoc_mod
from odam_tpu.models import detr as detr_mod
from odam_tpu.runtime import processor as proc_mod
from odam_tpu.runtime import tracker


def test_store_append_and_means():
    store = tracker.init_store(max_tracks=4, window=5)
    rows = np.full((2, 82), -1.0, np.float32)
    rows[0, 9:12] = [1.0, 2.0, 3.0]
    rows[0, 12] = 0.5
    rows[0, 6:9] = [1.0, 1.0, 1.0]
    rows[1, 9:12] = [4.0, 4.0, 4.0]
    rows[1, 12] = -0.5
    rows[1, 6:9] = [2.0, 2.0, 2.0]
    slots = jnp.array([0, 1], jnp.int32)
    valid = jnp.array([True, True])
    store = tracker.append_rows(store, jnp.asarray(rows), slots, valid)
    assert int(store.count) == 2
    assert store.length.tolist()[:2] == [1, 1]
    t, azi, dims = tracker.mean_state(store)
    np.testing.assert_allclose(np.asarray(t[0]), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(float(azi[1]), -0.5, atol=1e-6)

    # append to the same slot twice more -> mean updates
    store = tracker.append_rows(store, jnp.asarray(rows), slots, valid)
    t, azi, dims = tracker.mean_state(store)
    assert int(store.n_obs[0]) == 2
    np.testing.assert_allclose(np.asarray(t[0]), [1, 2, 3], atol=1e-6)


def test_store_window_roll():
    W = 3
    store = tracker.init_store(max_tracks=2, window=W)
    for k in range(5):
        row = np.full((1, 82), -1.0, np.float32)
        row[0, 0] = k  # frame id
        store = tracker.append_rows(
            store, jnp.asarray(row), jnp.array([0], jnp.int32), jnp.array([True])
        )
    # window holds the last 3 frames, oldest first
    assert int(store.length[0]) == W
    assert int(store.n_obs[0]) == 5
    np.testing.assert_allclose(np.asarray(store.window[0, :, 0]), [2, 3, 4])


def _spawn(store, frame_id, n=1):
    """Spawn n tracks at frame_id; returns (store, slots)."""
    is_new = jnp.ones((n,), bool)
    store, slots = tracker.assign_new_slots(store, is_new)
    rows = np.full((n, 82), -1.0, np.float32)
    rows[:, 0] = frame_id
    store = tracker.append_rows(
        store, jnp.asarray(rows), slots, jnp.ones((n,), bool)
    )
    return store, np.asarray(slots)


def test_assign_new_slots_free_then_evict_lru():
    store = tracker.init_store(max_tracks=3, window=4)
    store, s0 = _spawn(store, 10.0)
    store, s1 = _spawn(store, 20.0)
    assert s0.tolist() == [0] and s1.tolist() == [1]
    assert np.asarray(store.track_id)[:2].tolist() == [0, 1]

    # two more spawns: one free slot left, then LRU eviction of slot 0
    store, slots = _spawn(store, 30.0, n=2)
    assert slots.tolist() == [2, 0]          # slot 0 (frame 10) was LRU
    assert int(store.n_evicted) == 1
    assert int(store.n_dropped) == 0
    # recycled slot carries a fresh global id and a clean window
    assert np.asarray(store.track_id).tolist() == [3, 1, 2]
    assert int(store.n_obs[0]) == 1
    assert float(store.window[0, 0, 0]) == 30.0


def test_assign_new_slots_protected_and_dropped():
    store = tracker.init_store(max_tracks=2, window=4)
    store, _ = _spawn(store, 1.0)
    store, _ = _spawn(store, 2.0)
    protected = jnp.array([True, True])
    store, slots = tracker.assign_new_slots(
        store, jnp.array([True, True]), protected=protected
    )
    assert np.asarray(slots).tolist() == [-1, -1]
    assert int(store.n_dropped) == 2
    assert int(store.n_evicted) == 0
    # protecting only slot 1 -> slot 0 evicted for the first spawn
    store2, slots2 = tracker.assign_new_slots(
        store, jnp.array([True, False]), protected=jnp.array([False, True])
    )
    assert np.asarray(slots2).tolist() == [0, -1]
    assert int(store2.n_evicted) == 1


def test_frame_log_ids_survive_eviction_and_full_log():
    """Observations logged under global ids are not lost when the slot is
    recycled; a full log drops frames into n_lost instead of overwriting."""
    log = tracker.init_log(max_frames=3, max_dets=2)
    store = tracker.init_store(max_tracks=1, window=4)

    def log_obs(store, log, frame_id):
        is_new = jnp.array([True, False])  # one real det, one padding slot
        store, slots = tracker.assign_new_slots(store, is_new)
        rows = np.full((2, 82), -1.0, np.float32)
        rows[0, 0] = frame_id
        store = tracker.append_rows(store, jnp.asarray(rows), slots, is_new)
        ids = jnp.where(
            is_new & (slots >= 0), store.track_id[jnp.clip(slots, 0, 0)], -1
        )
        log = tracker.log_frame(log, jnp.asarray(rows), ids)
        return store, log

    for f in range(4):  # 4 spawns on a 1-slot store, 3-frame log
        store, log = log_obs(store, log, float(f))

    assert int(store.n_evicted) == 3
    assert int(log.n_lost) == 1          # 4th frame didn't fit
    tracks = tracker.drain_log(log)
    # three distinct global ids, one observation each, nothing overwritten
    assert sorted(tracks) == [0, 1, 2]
    for tid, rows in tracks.items():
        assert rows.shape == (1, 82)
        assert rows[0, 0] == float(tid)


def test_detection_row_lift_roundtrip():
    """camera->world->camera re-encoding is consistent."""
    from odam_tpu.utils import geometry as geo

    dets = detr_mod.Detections(
        valid=jnp.array([[True, False]]),
        classes=jnp.array([[5, 0]], jnp.int32),
        scores=jnp.array([[0.9, 0.0]]),
        boxes=jnp.array([[[100.0, 50, 300, 250], [0, 0, 0, 0]]]),
        dims=jnp.array([[[1.0, 0.8, 1.2], [0, 0, 0]]]),
        t_co=jnp.array([[[0.2, 0.1, 2.0], [0, 0, 0]]]),
        angle_deg=jnp.array([[30.0, 0.0]]),
        features=jnp.zeros((1, 2, 4)),
    )
    det79 = proc_mod.detection_rows_camera(
        dets, jnp.asarray(7.0), jnp.asarray(640.0), jnp.asarray(480.0)
    )
    assert det79.shape == (2, 79)
    assert float(det79[0, 0]) == 7.0
    assert float(det79[0, 1]) == 5.0
    np.testing.assert_allclose(np.asarray(det79[1]), -1.0)  # invalid row

    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, :3] = np.asarray(geo.rotz(jnp.asarray(0.7)))
    T_wc[:3, 3] = [1.0, 2.0, 0.0]
    det82 = proc_mod.lift_rows_to_world(
        det79, dets.valid[0], jnp.asarray(T_wc), jnp.asarray(640.0), jnp.asarray(480.0)
    )
    assert det82.shape == (2, 82)
    # world translation = T_wc @ t_co
    expected = (T_wc[:3, :3] @ np.array([0.2, 0.1, 2.0]) + T_wc[:3, 3])
    np.testing.assert_allclose(np.asarray(det82[0, 9:12]), expected, atol=1e-5)
    # azi_wo = azi_co + cam_azi
    cam_azi = float(geo.camera_azimuth(jnp.asarray(T_wc)))
    np.testing.assert_allclose(
        float(det82[0, 12]), np.deg2rad(30.0) + cam_azi, atol=1e-5
    )
    # bbox stored in pixels twice (cols 2:6 and 78:82)
    np.testing.assert_allclose(np.asarray(det82[0, 2:6]), [100, 50, 300, 250], atol=1e-3)
    np.testing.assert_allclose(np.asarray(det82[0, 78:82]), [100, 50, 300, 250], atol=1e-3)


def test_prepare_track_inputs_masks_padding():
    store = tracker.init_store(max_tracks=3, window=4)
    row = np.full((1, 82), -1.0, np.float32)
    row[0, 0] = 3
    row[0, 1] = 5
    row[0, 6:9] = [1.0, 1.0, 1.0]
    row[0, 9:12] = [0.0, 0.0, 1.0]
    row[0, 12] = 0.2
    row[0, 13] = 0.9
    store = tracker.append_rows(
        store, jnp.asarray(row), jnp.array([0], jnp.int32), jnp.array([True])
    )
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0, -3.0, 1.0]
    T_wc[:3, :3] = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)  # look +y
    out = proc_mod.prepare_track_inputs(
        store, jnp.asarray(T_wc), K, jnp.asarray(640.0), jnp.asarray(480.0),
        n_samples=128,
    )
    assert out.shape == (3, 4, 79)
    o = np.asarray(out)
    # slot 0, step 0 is real: time/class preserved
    assert o[0, 0, 0] == 3.0 and o[0, 0, 1] == 5.0
    # bbox columns are normalized and clipped
    assert (o[0, 0, 2:6] >= -1).all() and (o[0, 0, 2:6] <= 2).all()
    # everything else is -1 padding
    np.testing.assert_allclose(o[0, 1:], -1.0)
    np.testing.assert_allclose(o[1:], -1.0)


def _tiny_pipeline():
    dcfg = detr_mod.DETRConfig(
        num_classes=8, num_queries=8, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=1, dim_feedforward=32, aux_loss=False,
    )
    detr = detr_mod.DETR(dcfg)
    img = jnp.zeros((1, 64, 64, 3))
    dparams = detr.init(jax.random.key(0), img)
    acfg = assoc_mod.AssociatorConfig(
        descriptor_dim=32, keypoint_encoder=(78, 32, 32),
        gnn_layers=("self", "cross"), self_gnn_layers=("self",),
        sinkhorn_iterations=20,
    )
    assoc = assoc_mod.Associator(acfg)
    T, W, N = 8, 6, 5
    aparams = assoc.init(
        jax.random.key(1),
        jnp.full((1, T, W, 79), -1.0), jnp.zeros((1, T), bool),
        jnp.full((1, N, 79), -1.0), jnp.zeros((1, N), bool),
    )
    cfg = proc_mod.PipelineConfig(
        detect_threshold=0.0, score_threshold=0.0, max_tracks=T, max_dets=N,
        window=W, track_bbox_samples=64, optim_iters=5, optim_samples=64,
        min_views=1, max_objs=T, max_views=16,
    )
    return proc_mod.OdamPipeline(detr, dparams, assoc, aparams, cfg)


def test_sequence_state_checkpoint_roundtrip(tmp_path):
    """Mid-scene save/restore resumes to identical results."""
    pipe = _tiny_pipeline()
    K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(1)
    imgs = [rng.normal(size=(64, 64, 3)).astype(np.float32) for _ in range(4)]
    poses = []
    for f in range(4):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1 * f, 0, 0]
        poses.append(T)

    pipe.init_sequence(K, 64, 64)
    for f in range(2):
        pipe.process_frame(imgs[f], f, poses[f])
    path = str(tmp_path / "seq_state.pkl")
    pipe.save_sequence_state(path)
    for f in range(2, 4):
        pipe.process_frame(imgs[f], f, poses[f])
    tracks_a = pipe.tracks

    pipe2 = _tiny_pipeline()
    pipe2.restore_sequence_state(path)
    for f in range(2, 4):
        pipe2.process_frame(imgs[f], f, poses[f])
    tracks_b = pipe2.tracks

    assert len(tracks_a) == len(tracks_b)
    for a, b in zip(tracks_a, tracks_b):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_pipeline_end_to_end_synthetic():
    pipe = _tiny_pipeline()
    K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    pipe.init_sequence(K, 64, 64)
    rng = np.random.default_rng(0)
    import time

    times = []
    for f in range(4):
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, 3] = [0.1 * f, 0, 0]
        t0 = time.time()
        res = pipe.process_frame(img, f, T_wc)
        jax.block_until_ready(res.store.window)
        times.append(time.time() - t0)
    # with detect_threshold 0 and random weights, something was detected
    assert int(res.n_detections) > 0
    assert len(pipe.tracks) > 0
    # jit caching: later frames should be far faster than frame 0 (compile)
    assert times[-1] < times[0] / 2, times

    # mapping + merge run on whatever tracks were produced
    out = pipe.optim_process(pipe.tracks)
    assert len(out["bboxes_qc"]) == len(out["tracks"]) > 0
    assert np.isfinite(np.asarray(out["bboxes_qc"])).all()
    merged = pipe.merge_process(out)
    assert len(merged) >= 1
    out2 = pipe.optim_process(merged)
    assert len(out2["bboxes_qc"]) == len(merged)


def test_chunked_log_drain_equivalence():
    """A log capacity smaller than the scene (chunked drains) yields exactly
    the same track histories as an oversized log — long scenes lose nothing."""
    import dataclasses

    K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(2)
    imgs = [rng.normal(size=(64, 64, 3)).astype(np.float32) for _ in range(5)]
    poses = []
    for f in range(5):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.05 * f, 0, 0]
        poses.append(T)

    def run(max_log_frames):
        pipe = _tiny_pipeline()
        pipe.cfg = dataclasses.replace(pipe.cfg, max_log_frames=max_log_frames)
        pipe.init_sequence(K, 64, 64)
        for f in range(5):
            pipe.process_frame(imgs[f], f, poses[f])
        return pipe.tracks, pipe.overflow_report(warn=False)

    tracks_small, report_small = run(2)   # forces two mid-scene drains
    tracks_big, report_big = run(100)
    assert report_small["log_frames_lost"] == 0
    assert len(tracks_small) == len(tracks_big) > 0
    for a, b in zip(tracks_small, tracks_big):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_prepare_track_inputs_exact_matches_dense_sampling():
    """The closed-form dual-conic track bbox (mode='exact') must equal the
    limit of the reference-style sampled extremes: tighter than a coarse
    sample, matched by a dense one."""
    store = tracker.init_store(max_tracks=2, window=4)
    rows = np.full((2, 82), -1.0, np.float32)
    for i, (c, dims, azi) in enumerate(
        [([0.3, 0.2, 1.0], [0.8, 0.5, 0.9], 0.4),
         ([-0.5, -0.2, 0.8], [0.4, 0.7, 0.5], -0.9)]
    ):
        rows[i, 0] = 3
        rows[i, 1] = 5
        rows[i, 6:9] = dims
        rows[i, 9:12] = c
        rows[i, 12] = azi
        rows[i, 13] = 0.9
    store = tracker.append_rows(
        store, jnp.asarray(rows), jnp.array([0, 1], jnp.int32),
        jnp.array([True, True]),
    )
    K = jnp.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0, -4.0, 0.9]
    T_wc[:3, :3] = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)

    args = (store, jnp.asarray(T_wc), K, jnp.asarray(640.0), jnp.asarray(480.0))
    exact = np.asarray(proc_mod.prepare_track_inputs(*args, mode="exact"))
    # The closed form is the epsilon=1 ellipsoid bbox; verify it against a
    # dense sampling of the TRUE ellipsoid by checking the dual-conic bbox
    # directly (the pipeline's sampled mode uses the reference's shapes=0
    # superellipsoid, exponent 0.9 — a slightly larger surface).
    from odam_tpu.mapping import quadric as quad_mod
    from odam_tpu.utils import geometry as geo

    t_mean, azi_mean, dims_mean = tracker.mean_state(store)
    T_cw = np.linalg.inv(T_wc)
    P = np.asarray(K) @ T_cw[:3, :]
    for i in range(2):
        a = np.asarray(dims_mean[i]) / 2.0
        # dense ellipsoid surface
        u = np.linspace(0, 2 * np.pi, 400)
        v = np.linspace(0, np.pi, 200)
        uu, vv = np.meshgrid(u, v)
        pts = np.stack([
            a[0] * np.cos(uu) * np.sin(vv),
            a[1] * np.sin(uu) * np.sin(vv),
            a[2] * np.cos(vv),
        ], -1).reshape(-1, 3)
        c, s = np.cos(float(azi_mean[i])), np.sin(float(azi_mean[i]))
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        pts = pts @ R.T + np.asarray(t_mean[i])
        uvz = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ P.T
        uv = uvz[:, :2] / uvz[:, 2:]
        ref_box = np.array([uv[:, 0].min(), uv[:, 1].min(),
                            uv[:, 0].max(), uv[:, 1].max()])
        ref_box_n = np.clip(ref_box / np.array([640, 480, 640, 480]), -1, 2)
        np.testing.assert_allclose(exact[i, 0, 2:6], ref_box_n, atol=2e-3)

    # vs the reference-parity sampled mode (eps 0.9 surface): close, and the
    # eps<1 surface bulges outward, so its bbox contains the ellipsoid's
    dense = np.asarray(
        proc_mod.prepare_track_inputs(*args, n_samples=20000, mode="sampled")
    )
    np.testing.assert_allclose(exact[:2, 0, 2:6], dense[:2, 0, 2:6], atol=0.05)
    assert (dense[:2, 0, 2:4] <= exact[:2, 0, 2:4] + 1e-3).all()  # mins
    assert (dense[:2, 0, 4:6] >= exact[:2, 0, 4:6] - 1e-3).all()  # maxs
    # everything else identical
    np.testing.assert_allclose(exact[..., 6:], dense[..., 6:], atol=1e-6)


def test_capacity_stress_scannet_scale():
    """200 track fragments through a 64-slot store + small log with chunked
    drains: every observation must survive to the mapping input, eviction
    counters must account exactly, and nothing is dropped."""
    T_cap, N = 64, 4
    store = tracker.init_store(max_tracks=T_cap, window=8)
    log = tracker.init_log(max_frames=50, max_dets=N)
    history = {}
    total_obs = 0
    rng = np.random.default_rng(0)

    def drain_into_history(log):
        for tid, rows in tracker.drain_log(log).items():
            history.setdefault(tid, []).append(rows)
        return tracker.init_log(max_frames=50, max_dets=N)

    frames_in_log = 0
    for f in range(120):  # 120 frames x up to 4 spawns -> ~200+ fragments
        n_new = int(rng.integers(1, N + 1))
        is_new = jnp.arange(N) < n_new
        store, slots = tracker.assign_new_slots(store, is_new)
        rows = np.full((N, 82), -1.0, np.float32)
        rows[:, 0] = f
        rows[:, 9:12] = rng.normal(size=(N, 3))
        ok = np.asarray(is_new) & (np.asarray(slots) >= 0)
        store = tracker.append_rows(store, jnp.asarray(rows), slots, jnp.asarray(ok))
        ids = jnp.where(
            jnp.asarray(ok), store.track_id[jnp.clip(slots, 0, T_cap - 1)], -1
        )
        log = tracker.log_frame(log, jnp.asarray(rows), ids)
        total_obs += int(ok.sum())
        frames_in_log += 1
        if frames_in_log == 50:
            log = drain_into_history(log)
            frames_in_log = 0
    drain_into_history(log)

    n_ids = int(store.next_id)
    assert n_ids > T_cap  # far beyond capacity
    assert int(store.n_dropped) == 0
    assert int(store.n_evicted) == n_ids - T_cap
    # every observation of every fragment is in the history, none lost
    recovered = sum(sum(len(c) for c in chunks) for chunks in history.values())
    assert recovered == total_obs == n_ids  # one obs per spawned fragment
    assert len(history) == n_ids


def _overflow_scene(n_objects=16, capacity=6, life=36, spacing=8,
                    n_frames=None, log_frames=40):
    """Drive a staggered-object scene through a small store + chunked log,
    with real projective geometry, and map the drained tracks.

    Objects appear every ``spacing`` frames and live ``life`` frames, so at
    most ceil(life/spacing) are simultaneously live; with ``capacity`` at
    least that, eviction only ever recycles DEAD fragments (the LRU rule
    targets least-recently-observed), so accuracy must be fully preserved.
    Returns (per-object best oriented-IoU, overflow report dict).
    """
    from odam_tpu.mapping import constraints, optimizer, prior
    from odam_tpu.mapping import superquadric as sq
    from odam_tpu.utils import geometry as geo, host_boxes

    if n_frames is None:
        n_frames = spacing * (n_objects - 1) + life + 1
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(7)
    objects = []
    for i in range(n_objects):
        center = np.array([2.2 * (i % 4) - 3.3, 2.2 * (i // 4 % 4) - 3.3, 0.45])
        dims = rng.uniform(0.5, 1.2, 3)
        objects.append((center, dims, float(rng.uniform(0, np.pi)), int(i % 8)))

    def look_at(cam, target):
        fwd = target - cam
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, np.cross(fwd, right), fwd, cam
        return T

    N_DET = 8
    store = tracker.init_store(max_tracks=capacity, window=16)
    log = tracker.init_log(max_frames=log_frames, max_dets=N_DET)
    history: dict[int, list] = {}
    frames_in_log = 0
    slot_of: dict[int, int] = {}
    fid_of: dict[int, int] = {}
    P_cws = []
    for f in range(n_frames):
        phi = 2 * np.pi * f / n_frames
        cam = np.array([9.0 * np.cos(phi), 9.0 * np.sin(phi), 2.2])
        T_wc = look_at(cam, np.array([0.0, 0.0, 0.5]))
        P = (K @ np.linalg.inv(T_wc)[:3, :]).astype(np.float32)
        P_cws.append(P)
        alive = [i for i in range(n_objects)
                 if spacing * i <= f < spacing * i + life]
        rows = np.full((N_DET, 82), -1.0, np.float32)
        is_new = np.zeros(N_DET, bool)
        exist_slot = np.full(N_DET, -1, np.int32)
        for j, oi in enumerate(alive):
            center, dims, yaw, cls = objects[oi]
            corners = np.asarray(geo.box3d_corners(
                jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center)))
            pix = np.concatenate([corners, np.ones((8, 1))], 1) @ P.T
            uv = pix[:, :2] / pix[:, 2:]
            box = np.array([uv[:, 0].min(), uv[:, 1].min(),
                            uv[:, 0].max(), uv[:, 1].max()])
            rows[j, 0] = f
            rows[j, 1] = cls
            rows[j, 2:6] = box + rng.normal(0, 1.5, 4)
            rows[j, 6:9] = dims * rng.uniform(0.9, 1.1, 3)
            rows[j, 9:12] = center + rng.normal(0, 0.06, 3)
            rows[j, 12] = yaw + rng.normal(0, 0.04)
            rows[j, 13] = 0.9
            rows[j, 78:82] = rows[j, 2:6]
            s = slot_of.get(oi, -1)
            if s >= 0 and int(store.track_id[s]) == fid_of[oi]:
                exist_slot[j] = s  # fragment still owns its slot
            else:
                is_new[j] = True  # first sight (or evicted mid-life)
        store, new_slots = tracker.assign_new_slots(store, jnp.asarray(is_new))
        slots = np.where(is_new, np.asarray(new_slots), exist_slot)
        valid = (slots >= 0) & (np.arange(N_DET) < len(alive))
        store = tracker.append_rows(store, jnp.asarray(rows),
                                    jnp.asarray(slots, np.int32),
                                    jnp.asarray(valid))
        ids = np.full(N_DET, -1, np.int32)
        for j, oi in enumerate(alive):
            if valid[j]:
                tid = int(store.track_id[slots[j]])
                ids[j] = tid
                slot_of[oi], fid_of[oi] = int(slots[j]), tid
        log = tracker.log_frame(log, jnp.asarray(rows), jnp.asarray(ids))
        frames_in_log += 1
        if frames_in_log == log_frames:
            for tid, r in tracker.drain_log(log).items():
                history.setdefault(tid, []).append(r)
            log = tracker.init_log(max_frames=log_frames, max_dets=N_DET)
            frames_in_log = 0
    for tid, r in tracker.drain_log(log).items():
        history.setdefault(tid, []).append(r)

    report = {"n_evicted": int(store.n_evicted),
              "n_dropped": int(store.n_dropped),
              "log_frames_lost": int(log.n_lost),
              "n_track_ids": int(store.next_id)}
    tracks = [np.concatenate(chunks, 0)
              for _, chunks in sorted(history.items())]

    sc = constraints.build_scene_constraints(
        tracks, np.arange(n_frames), np.asarray(P_cws), 480, 640,
        max_objs=max(n_objects, len(tracks)), max_views=64, min_views=10)
    init = sq.init_params(jnp.asarray(sc.init_translate),
                          jnp.asarray(sc.init_angle),
                          jnp.asarray(sc.init_dims))
    res = optimizer.optimize_superquadrics(
        init, jnp.asarray(sc.boxes), jnp.asarray(sc.box_mask),
        jnp.asarray(sc.view_mask), jnp.asarray(sc.P_cw),
        jnp.asarray(sc.optimize_mask),
        jnp.asarray(prior.prior_invcov_for_classes(sc.obj_class)),
        n_iters=100, n_samples=256)
    pred = np.asarray(res.corners)
    ious = []
    for center, dims, yaw, cls in objects:
        gt = np.asarray(geo.box3d_corners(
            jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center)),
            np.float64)
        best = 0.0
        for t in range(len(tracks)):
            if not bool(sc.optimize_mask[t]):
                continue
            iou, _ = host_boxes.box3d_iou(gt, np.asarray(pred[t], np.float64))
            best = max(best, iou)
        ious.append(best)
    return np.asarray(ious), report, tracks


def test_overflow_accuracy_graceful():
    """Adversarial capacity load, end to end (VERDICT r4 #8): 16 objects
    staggered through a 6-slot store (vs 32 uncapped) with chunked 40-frame
    log drains.  Eviction must recycle only dead fragments, every
    observation must reach the mapping input, and the mapped accuracy must
    be IDENTICAL to the uncapped run — overflow is graceful by construction,
    not just counted."""
    ious, report, tracks = _overflow_scene(capacity=6)
    # capacity pressure actually happened, and nothing was lost
    assert report["n_track_ids"] == 16
    assert report["n_evicted"] == 16 - 6
    assert report["n_dropped"] == 0 and report["log_frames_lost"] == 0
    # every observation survived to mapping: 16 tracks x 36-frame lives
    assert len(tracks) == 16
    assert all(len(t) == 36 for t in tracks)
    # accuracy: every object recovered (same bar as the mapping example)
    assert (ious > 0.4).all(), ious

    ious_uncapped, report2, _ = _overflow_scene(capacity=32)
    assert report2["n_evicted"] == 0
    # graceful = bit-identical to the uncapped store, not merely "close"
    np.testing.assert_allclose(ious, ious_uncapped, atol=1e-6)
