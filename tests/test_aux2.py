"""Tests for PLY IO, train transforms, file utils, distributed helpers,
checkpointing round trip, and the run snapshot."""
import os
import struct

import numpy as np
import pytest

from odam_tpu.data import scannet, transforms
from odam_tpu.parallel import distributed
from odam_tpu.utils import checkpoint, files


def _write_ascii_ply(path, verts):
    with open(path, "wb") as f:
        f.write(b"ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n".encode())


def _write_binary_ply(path, verts, colors):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        for v, c in zip(verts, colors):
            f.write(struct.pack("<fffBBB", *v, *c))


def test_ply_ascii(tmp_path, rng):
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    _write_ascii_ply(p, verts)
    out = scannet.read_ply_vertices(p)
    np.testing.assert_allclose(out, verts, atol=1e-4)


def test_ply_binary_with_rgb(tmp_path, rng):
    verts = rng.normal(size=(7, 3)).astype(np.float32)
    colors = rng.integers(0, 255, (7, 3)).astype(np.uint8)
    p = str(tmp_path / "m.ply")
    _write_binary_ply(p, verts, colors)
    out = scannet.read_ply_vertices(p, with_rgb=True)
    assert out.shape == (7, 6)
    np.testing.assert_allclose(out[:, :3], verts, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:], colors, atol=0)


def test_segmentation_readers(tmp_path):
    import json

    seg = tmp_path / "seg.json"
    seg.write_text(json.dumps({"segIndices": [0, 0, 1, 2, 2, 2]}))
    agg = tmp_path / "agg.json"
    agg.write_text(json.dumps({
        "segGroups": [
            {"objectId": 0, "label": "chair", "segments": [0, 1]},
            {"objectId": 1, "label": "table", "segments": [2]},
        ]
    }))
    inst = scannet.read_instance_vertices(str(seg), str(agg))
    np.testing.assert_array_equal(inst, [1, 1, 1, 2, 2, 2])


def test_hflip_with_targets():
    img = np.zeros((4, 6, 3), np.float32)
    img[:, 0] = 1.0
    objects = np.zeros((1, 12), np.float32)
    objects[0, 1] = 0.2   # cx
    objects[0, 8] = 0.1   # off_x
    objects[0, -1] = 0.5  # angle
    out, obj = transforms.hflip_with_targets(img, objects)
    assert out[0, -1, 0] == 1.0  # column moved to the right edge
    np.testing.assert_allclose(obj[0, 1], 0.8)
    np.testing.assert_allclose(obj[0, 8], -0.1)
    np.testing.assert_allclose(obj[0, -1], -0.5)


def test_train_transform_canvas(rng):
    img = rng.integers(0, 255, (100, 150, 3)).astype(np.uint8)
    objects = np.zeros((2, 12), np.float32)
    objects[:, 1:5] = 0.5
    padded, mask, obj = transforms.train_transform(img, objects, rng, canvas=(800, 1344))
    assert padded.shape == (800, 1344, 3)
    assert mask.shape == (800, 1344)
    assert not mask[0, 0] and mask[-1, -1]  # top-left valid, bottom-right padded


def test_file_utils(tmp_path):
    assert files.get_file_name("/a/b/c.txt") == "c"
    assert len(files.get_date_time()) == 19
    sha = files.get_git_sha("/root/repo")
    assert sha == "unknown" or len(sha) >= 40
    files.snapshot_run(str(tmp_path), cfg={"lr": 0.1})
    assert (tmp_path / "run_info.txt").exists()
    assert (tmp_path / "config_snapshot.yaml").exists()


def test_distributed_single_process():
    assert distributed.process_count() == 1
    assert distributed.is_main_process()
    g = distributed.all_gather_arrays(np.array([1.0, 2.0]))
    assert g.shape == (1, 2)
    red = distributed.reduce_scalars({"loss": 2.0})
    assert red["loss"] == 2.0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32),
            "nested": {"b": jnp.ones((4,))}}
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, tree)
    like = {"a": jnp.zeros((2, 3)), "nested": {"b": jnp.zeros((4,))}}
    restored = checkpoint.restore(path, like)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_allclose(np.asarray(restored["nested"]["b"]), 1.0)


def test_fit_superquadric_demo(tmp_path):
    """Headless SQ-fitting demo (examples/fit_superquadric.py — twin of the
    reference's interactive Pangolin demo, learnable_primitives/main.py:18-117):
    short schedule must reduce the loss and write all three artifacts."""
    from examples.fit_superquadric import main

    r = main(str(tmp_path), n_iters=150, seed=0, verbose=False)
    assert r["loss_final"] < 0.6 * r["loss_first"]
    for key in ("gt", "fitted", "strip"):
        assert os.path.getsize(r["paths"][key]) > 0
    with open(r["paths"]["fitted"]) as f:
        head = f.read(2)
    assert head == "v "


def test_hard_rehearsal_visibility_gate():
    """Hard-rehearsal renderer visibility accounting
    (examples/cli_rehearsal/hard.py + analyze_visibility.py): per-row
    visible fractions are consistent with the painter's render, the
    training-target gate drops only low-visibility rows, and the rendered
    image is identical with and without the audit."""
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "examples", "cli_rehearsal"))
    try:
        import hard
        from analyze_visibility import visible_flags
    finally:
        sys.path.pop(0)

    seed = 0
    objects = hard.make_hard_objects(seed)
    background = hard._background(seed)
    views = hard.hard_scene_views(seed, pose_noise=False)
    fid, T_wc, img_ref, rows_ref, inst_ref = views[0]
    frame_rng = np.random.default_rng(4000 + seed * 100 + fid)
    img, rows, inst, vis = hard.render_hard(
        objects, T_wc, background, frame_rng, return_vis=True)
    np.testing.assert_array_equal(img, img_ref)      # audit changes nothing
    # (views render with a float64 pose internally; this re-render feeds the
    # float32 copy back in -> epsilon-level row differences are expected)
    np.testing.assert_allclose(rows, rows_ref, rtol=1e-4, atol=1e-4)
    assert vis.shape == (len(rows), 3)
    # fractions are pixel-count / float-bbox-area: integer painting can
    # overshoot 1.0 by a rounding sliver on small boxes
    assert (vis[:, 0] >= 0).all() and (vis[:, 0] <= 1.05).all()
    # the nearest (last-painted, unclipped) object must be fully visible
    assert vis[:, 0].max() > 0.95

    # training gate: filtered rows are a subset; a generator draw sometimes
    # drops rows (occlusion is common by construction)
    rng = np.random.default_rng(3)
    dropped = 0
    for _ in range(10):
        state = rng.bit_generator.state
        img_a, rows_a = hard.hard_random_view(rng)
        rng.bit_generator.state = state
        img_b, rows_b = hard.hard_random_view(rng, vis_filter=False)
        np.testing.assert_array_equal(img_a, img_b)
        assert len(rows_a) <= len(rows_b)
        dropped += len(rows_b) - len(rows_a)
        # every kept row exists verbatim in the unfiltered set
        for r in rows_a:
            assert any(np.allclose(r, r2) for r2 in rows_b)
    assert dropped > 0

    # ceiling audit: flags line up with the renderer's row listing
    objs, flags, listed, mean_vis = visible_flags(seed)
    assert flags.shape == (hard.N_FRAMES_HARD, len(objs))
    assert (flags.sum(0) <= listed).all()


def test_audit_misses_modes(tmp_path):
    """Per-object miss audit (examples/cli_rehearsal/audit_misses.py):
    a fabricated result dir with known defects must be classified into the
    right loss modes — matched / short_track / no_track — replicating the
    evaluator's greedy matching on real pickles."""
    import pickle
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, os.path.join(root, "examples", "cli_rehearsal"))
    try:
        import hard
        from audit_misses import audit_scene
    finally:
        sys.path.pop(0)

    from odam_tpu.eval import scan2cad as s2c
    from odam_tpu.mapping.prior import CLASS_MAPPER
    from odam_tpu.utils import host_boxes

    seed = 0
    scene = hard.hard_scene_id(seed)
    gts = s2c.parse_scan2cad_annotations(hard.hard_scene_annotation(seed))
    inv = {v: k for k, v in CLASS_MAPPER.items()}

    # find two GT objects isolated from every other GT box (IoU <= 0.05),
    # so corrupting their own track provably leaves no other claimant
    iso = []
    for i, (_, bi) in enumerate(gts):
        worst = max(
            host_boxes.box3d_iou(np.asarray(bi), np.asarray(bj))[0]
            for j, (_, bj) in enumerate(gts) if j != i
        )
        if worst <= 0.05:
            iso.append(i)
    assert len(iso) >= 2, "hard scene 0 should have >=2 isolated objects"
    short_i, lost_i = iso[0], iso[1]

    tracks, boxes = [], []
    for g, (cat, corners) in enumerate(gts):
        t = np.full((12, 82), -1.0, np.float32)
        t[:, 1] = inv[cat]
        tracks.append(t)
        boxes.append(np.asarray(corners, np.float32))
    tracks[short_i] = tracks[short_i][:5]      # starves min_views
    boxes[lost_i] = boxes[lost_i] + 100.0      # track box nowhere near GT

    os.makedirs(os.path.join(tmp_path, scene))
    with open(os.path.join(tmp_path, scene, scene), "wb") as f:
        pickle.dump({"tracks": tracks, "bboxes_qc": boxes}, f)

    rows, fps = audit_scene(seed, str(tmp_path))
    modes = {r["gt"]: r["mode"] for r in rows}
    assert modes[short_i] == "short_track"
    assert modes[lost_i] == "no_track"
    matched = [g for g, m in modes.items() if m == "matched"]
    assert len(matched) == len(gts) - 2
    # the displaced >=min_views prediction surfaces as a precision hit
    assert any(p["track"] == lost_i for p in fps)
