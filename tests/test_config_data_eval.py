import json
import os

import numpy as np
import pytest

from odam_tpu import config as config_mod
from odam_tpu.data import datasets, scannet, transforms
from odam_tpu.eval import detection, scan2cad
from odam_tpu.utils import metrics


# ---------------------------------------------------------------- config

def test_config_merge_and_override(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text("lr: 0.1\nmodel:\n  depth: 6\nflag: false\n")
    p2 = tmp_path / "b.yaml"
    p2.write_text("model:\n  depth: 12\n")
    cfg = config_mod.merge_cfg([str(p1), str(p2)])
    assert cfg.lr == 0.1
    assert cfg.model.depth == 12
    # CLI override with type coercion (string -> original type)
    cfg2 = config_mod.merge_args(cfg, ["lr:0.5", "model.depth:3", "flag:true"])
    assert cfg2.lr == 0.5 and isinstance(cfg2.lr, float)
    assert cfg2.model.depth == 3 and isinstance(cfg2.model.depth, int)
    assert cfg2.flag is True


def test_repo_config_parses():
    cfg = config_mod.merge_cfg(["configs/detr_scan_net.yaml"])
    assert cfg.hidden_dim == 256
    assert cfg.GNN_layers == ["self", "cross"] * 4
    assert cfg.dataset.img_h == 968
    from odam_tpu.models import associator as am, detr as dm

    dcfg = dm.DETRConfig.from_cfg(cfg)
    assert dcfg.num_classes == 18 and dcfg.enc_layers == 6
    acfg = am.AssociatorConfig.from_cfg(cfg)
    assert acfg.sinkhorn_iterations == 100


# ---------------------------------------------------------------- scannet io

def test_scannet_matrix_io(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    p = tmp_path / "pose.txt"
    p.write_text("\n".join(" ".join(str(v) for v in row) for row in T))
    T_cw = scannet.read_extrinsic(str(p))
    np.testing.assert_allclose(T_cw, np.linalg.inv(T), atol=1e-9)

    meta = tmp_path / "scene.txt"
    vals = " ".join(str(float(i)) for i in range(16))
    meta.write_text(f"colorWidth = 1296\naxisAlignment = {vals}\n")
    M = scannet.read_axis_align(str(meta))
    np.testing.assert_allclose(M, np.arange(16.0).reshape(4, 4))


def test_quaternion_to_matrix():
    # 90 deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = scannet.quaternion_to_matrix(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-9)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-9)


def test_scene_index(tmp_path):
    scene = tmp_path / "scene0000_00" / "frames"
    (scene / "color").mkdir(parents=True)
    (scene / "pose").mkdir()
    for f in [0, 10, 2]:
        (scene / "color" / f"{f}.jpg").write_bytes(b"")
    idx = scannet.SceneIndex(str(tmp_path))
    assert idx.sequences == ["scene0000_00"]
    assert idx.frame_names("scene0000_00") == ["0", "2", "10"]  # numeric sort


# ---------------------------------------------------------------- transforms

def test_target_size_rules():
    assert transforms.target_size(968, 1296) == (800, 1071)
    # long-side cap kicks in
    h, w = transforms.target_size(500, 2000)
    assert w == 1333 and h == round(500 * 1333 / 2000)
    # pad multiple
    h, w = transforms.target_size(968, 1296, pad_multiple=32)
    assert h % 32 == 0 and w % 32 == 0


def test_preprocess_image_normalization():
    img = np.full((64, 64, 3), 128, np.uint8)
    out = transforms.preprocess_image(img, 32, 32)
    assert out.shape == (32, 32, 3)
    expected = (128 / 255 - transforms.IMAGENET_MEAN) / transforms.IMAGENET_STD
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-2)


# ---------------------------------------------------------------- datasets

def test_angle_to_class():
    assert datasets.angle_to_class(np.array([0.0]))[0] == 0
    assert datasets.angle_to_class(np.array([np.pi / 2]))[0] == 15
    # wraps period pi: angle and angle+pi share a bin
    a = np.array([0.3])
    assert datasets.angle_to_class(a)[0] == datasets.angle_to_class(a + np.pi)[0]


def test_pack_targets():
    rows = np.zeros((2, 12), np.float32)
    rows[:, 0] = [3, 5]
    rows[:, 1:5] = 0.5
    rows[:, -2] = 2.0
    t = datasets.pack_targets([rows, np.zeros((0, 12))], max_objects=4)
    assert t.mask[0].tolist() == [True, True, False, False]
    assert not t.mask[1].any()
    assert t.classes[0, 1] == 5
    np.testing.assert_allclose(t.depths[0, :2], 2.0)


def test_association_sample_builder():
    rng = np.random.default_rng(0)
    tracks = []
    for t in range(3):
        rows = np.full((6, 82), -1.0, np.float32)
        rows[:, 0] = np.arange(6)
        rows[:, 1] = t
        rows[:, 9:12] = rng.normal(size=3)
        tracks.append(rows)
    # drop track 2's observation at frame 3
    tracks[2] = tracks[2][tracks[2][:, 0] != 3]

    s = datasets.build_association_sample(tracks, 3.0, max_tracks=6, max_dets=4, window=5)
    assert s is not None
    assert s["track_mask"].sum() == 3  # all have history
    assert s["det_mask"].sum() == 2    # tracks 0, 1 observed at frame 3
    # gt pairs: two matches + one unmatched-track dustbin
    pairs = {tuple(p) for p in s["gt_pairs"]}
    assert (0, 0) in pairs and (1, 1) in pairs
    assert (2, 4) in pairs  # track 2 -> detection dustbin column N=4


def test_association_sample_extra_dets_go_to_dustbin():
    """False-positive augmentation: extra_dets append as detections whose
    GT target is the dustbin row, never a track slot."""
    rng = np.random.default_rng(0)
    tracks = []
    for t in range(2):
        rows = np.full((6, 82), -1.0, np.float32)
        rows[:, 0] = np.arange(6)
        rows[:, 1] = t
        rows[:, 9:12] = rng.normal(size=3)
        tracks.append(rows)
    ghosts = np.full((2, 82), -1.0, np.float32)
    ghosts[:, 0] = 3.0
    ghosts[:, 1] = 5
    ghosts[:, 9:12] = rng.normal(size=(2, 3))

    s = datasets.build_association_sample(
        tracks, 3.0, max_tracks=6, max_dets=5, window=5, extra_dets=ghosts)
    assert s["det_mask"].sum() == 4          # 2 real + 2 ghosts
    pairs = {tuple(p) for p in s["gt_pairs"]}
    assert (0, 0) in pairs and (1, 1) in pairs
    # ghost detections 2, 3 -> dustbin row T=6
    assert (6, 2) in pairs and (6, 3) in pairs
    # the det cap still applies to the combined list
    s2 = datasets.build_association_sample(
        tracks, 3.0, max_tracks=6, max_dets=3, window=5, extra_dets=ghosts)
    assert s2["det_mask"].sum() == 3


def test_associator_dataset_batches():
    rng = np.random.default_rng(1)
    from scripts.train_associator import synthetic_scenes

    ds = datasets.AssociatorDataset(
        synthetic_scenes(rng, n_scenes=2, n_tracks=3, n_frames=10),
        max_tracks=8, max_dets=6, window=8, max_pairs=16,
    )
    assert len(ds) > 0
    b = next(ds.batches(2, rng))
    assert b["tracks"].shape == (2, 8, 8, 79)
    assert b["gt_pairs"].shape == (2, 16, 2)


# ---------------------------------------------------------------- eval

def test_voc_ap_perfect_and_zero():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert detection.voc_ap(r, p) == pytest.approx(1.0)
    assert detection.voc_ap(np.array([0.0]), np.array([0.0])) == pytest.approx(0.0)


def test_eval_det_simple():
    box = np.array([[0, 0, 0], [1, 1, 1.0]])
    far = box + 10
    preds = {"s1": [(0, box, 0.9), (0, far + 5, 0.8)]}
    gts = {"s1": [(0, box), (0, far)]}
    out = detection.eval_det(preds, gts)
    assert out[0]["recall"] == pytest.approx(0.5)
    assert out[0]["precision"] == pytest.approx(0.5)


def test_eval_det_multiprocessing_parity(monkeypatch):
    """The Pool path (reference eval_det_multiprocessing,
    eval_utils.py:238-284) must agree with the serial path; this 1-core host
    is auto-gated to serial unless cpu_count is faked up."""
    rng = np.random.default_rng(0)
    preds: dict = {}
    gts: dict = {}
    for s in range(3):
        scene = f"s{s}"
        preds[scene], gts[scene] = [], []
        for cls in range(4):
            for _ in range(3):
                lo = rng.uniform(0, 5, 3)
                box = np.stack([lo, lo + rng.uniform(0.5, 2, 3)])
                gts[scene].append((cls, box))
                jitter = rng.uniform(-0.3, 0.3, 3)
                pred = box + jitter
                preds[scene].append((cls, pred, float(rng.uniform(0.1, 1))))
    serial = detection.eval_det(preds, gts)

    import os
    monkeypatch.setattr(os, "cpu_count", lambda: 4)
    parallel = detection.eval_det(preds, gts, n_workers=2)
    assert serial.keys() == parallel.keys()
    for cls in serial:
        for k in ("recall", "precision", "ap"):
            assert serial[cls][k] == pytest.approx(parallel[cls][k])


def test_alignment_accuracy():
    R = np.eye(3)
    t = np.zeros(3)
    s = np.ones(3)
    assert detection.alignment_accuracy(t, R, s, t, R, s)
    assert not detection.alignment_accuracy(t + 0.5, R, s, t, R, s)
    # rotation within symmetry
    c, si = np.cos(np.pi), np.sin(np.pi)
    R180 = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1]])
    assert not detection.alignment_accuracy(t, R180, s, t, R, s, n_rot_sym=1)
    assert detection.alignment_accuracy(t, R180, s, t, R, s, n_rot_sym=2)
    # IoU override
    assert detection.alignment_accuracy(t + 9, R, s, t, R, s, iou=0.6)


def test_scan2cad_f1_pipeline(tmp_path):
    import jax.numpy as jnp

    from odam_tpu.utils import geometry as geo

    # GT scan with one chair; prediction pickle with a matching box.
    dims = np.array([0.6, 0.6, 1.0])
    corners = np.asarray(
        geo.box3d_corners(jnp.asarray(dims), jnp.asarray(0.0), jnp.asarray([1.0, 2.0, 0.5]))
    )
    scene = "scene9999_00"
    sdir = tmp_path / "result" / scene
    sdir.mkdir(parents=True)
    track = np.zeros((12, 82))
    track[:, 1] = 5  # chair
    import pickle

    with open(sdir / scene, "wb") as f:
        pickle.dump({"tracks": [track], "bboxes_qc": [corners], "bboxes_dl": [corners],
                     "quadrics": [None]}, f)

    preds = scan2cad.load_predictions(str(tmp_path / "result"), min_views=10)
    assert len(preds[scene]) == 1
    counts = scan2cad.F1Counts()
    gts = [("03001627", corners.copy())]
    scan2cad.match_sequence(counts, preds[scene], gts)
    res = scan2cad.summarize(counts, verbose=False)
    assert res["chair"]["f1"] == pytest.approx(1.0)
    assert res["average"]["f1"] == pytest.approx(1.0)


# ---------------------------------------------------------------- metrics

def test_metric_logger(tmp_path):
    log = tmp_path / "log.jsonl"
    ml = metrics.MetricLogger(str(log))
    ml.log(step=1, loss=2.0)
    ml.log(step=2, loss=1.0)
    assert ml.loss.global_avg == pytest.approx(1.5)
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert lines[1]["loss"] == 1.0


def test_stage_timer():
    st = metrics.StageTimer()
    with st.time("a"):
        pass
    with st.time("a"):
        pass
    s = st.summary()
    assert s["a"]["count"] == 2


def test_vid2cad_loader(tmp_path):
    """Vid2CAD CSV -> prediction schema (reference eval_scan2cad.py:148-188):
    quaternion pose + box2cad scale folding + axis-align lift, header skipped,
    non-cared classes and under-observed rows dropped."""
    import jax.numpy as jnp

    from odam_tpu.utils import geometry as geo
    from odam_tpu.utils import host_boxes

    theta = 0.7
    dims = np.array([0.8, 0.5, 1.2])
    t = np.array([1.0, 2.0, 0.5])
    q = [np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)]  # wxyz, about z
    csv_s = dims * 2  # the loader halves it (then folds identity box2cad)

    def row(scene, cat, cad, n_frames):
        return ",".join(
            [scene, cat, cad] + [f"{v}" for v in t] + [f"{v}" for v in q]
            + [f"{v}" for v in csv_s] + ["0", str(n_frames), "0.9"]
        )

    csv_path = tmp_path / "vid2cad.csv"
    csv_path.write_text(
        "\n".join([
            "scene,cat,id,tx,ty,tz,qw,qx,qy,qz,sx,sy,sz,_,nframes,score",
            row("0000_00", "03001627", "abc", 25),   # kept
            row("0000_00", "03001627", "abc", 3),    # below view threshold
            row("0000_00", "99999999", "abc", 25),   # non-cared class
        ])
    )
    box2cad = {"03001627_abc": np.eye(4).tolist()}
    T_align = np.eye(4)
    T_align[2, 3] = 1.0  # axis-align lifts everything by +1 z

    preds = scan2cad.load_predictions_vid2cad(
        str(csv_path), {"scene0000_00": T_align}, box2cad, view_threshold=10
    )
    assert list(preds) == ["scene0000_00"]
    assert len(preds["scene0000_00"]) == 1
    p = preds["scene0000_00"][0]
    assert p["class"] == "03001627"

    # GT offset by 1 cm: exactly-coincident rotated corners hit a (reference-
    # parity) degeneracy in the self-clipping polygon IoU, and real
    # predictions are never bit-identical to GT anyway.
    gt_corners = np.asarray(
        geo.box3d_corners(
            jnp.asarray(dims), jnp.asarray(theta), jnp.asarray(t + [0.01, 0, 1.0])
        )
    ).astype(np.float64)
    iou, _ = host_boxes.box3d_iou(gt_corners, np.asarray(p["bbox"], np.float64))
    assert iou > 0.9

    # same matching path as ours: F1 = 1 for the chair class
    counts = scan2cad.F1Counts()
    scan2cad.match_sequence(counts, preds["scene0000_00"], [("03001627", gt_corners)])
    res = scan2cad.summarize(counts, verbose=False)
    assert res["chair"]["f1"] == pytest.approx(1.0)
