"""Write the synthetic val split to disk in the exact ScanNet + Scan2CAD
layout the run_processor / eval_scan2cad CLIs consume.

    PYTHONPATH=.:examples/cli_rehearsal python examples/cli_rehearsal/make_dataset.py [out_root]

Produces under <out_root> (default examples/cli_rehearsal/data):
    scans/sceneXXXX_00/frames/{color/*.jpg, pose/*.txt, intrinsic/intrinsic_color.txt}
    scans/sceneXXXX_00/sceneXXXX_00.txt        (axisAlignment meta)
    full_annotations.json                      (Scan2CAD GT)
    val.txt                                    (split file)
    rehearsal.yaml                             (tiny model config)
"""
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

from common import IMG, K, SCENES, scene_views  # noqa: E402
from odam_tpu.mapping.prior import CLASS_MAPPER  # noqa: E402

YAML = """\
# tiny rehearsal config (matches examples/cli_rehearsal/common.py make_detr/make_assoc)
backbone: "resnet50"
position_embedding: 'sine'
enc_layers: 2
dec_layers: 2
dim_feedforward: 256
hidden_dim: 64
dropout: 0.0
nheads: 4
num_queries: 12
num_classes: 8
pre_norm: False
aux_loss: True
dataset_file: "scan_net"
masks: False
dilation: False

descriptor_dim: 64
keypoint_encoder: [78, 64, 64]
GNN_layers: ['self', 'cross', 'self', 'cross']
self_GNN_layers: ['self']
sinkhorn_iterations: 30
match_threshold: 0.2

dataset:
  img_h: 128
  img_w: 128
"""


def yaw_quat(yaw: float) -> list:
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def main(root: str) -> None:
    scans = os.path.join(root, "scans")
    annotations = []
    K44 = np.eye(4)
    K44[:3, :3] = K
    aa_line = "axisAlignment = " + " ".join(str(v) for v in np.eye(4).reshape(-1))

    for scene_id, objects in SCENES.items():
        base = os.path.join(scans, scene_id, "frames")
        for sub in ("color", "pose", "intrinsic"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        np.savetxt(os.path.join(base, "intrinsic", "intrinsic_color.txt"), K44)
        with open(os.path.join(scans, scene_id, f"{scene_id}.txt"), "w") as f:
            f.write(aa_line + "\n")
        for fid, T_wc, img, _ in scene_views(scene_id):
            Image.fromarray(img).save(
                os.path.join(base, "color", f"{fid}.jpg"), quality=95
            )
            np.savetxt(os.path.join(base, "pose", f"{fid}.txt"), T_wc)

        annotations.append({
            "id_scan": scene_id,
            "trs": {"translation": [0, 0, 0], "rotation": [1, 0, 0, 0],
                    "scale": [1, 1, 1]},
            "aligned_models": [
                {
                    "catid_cad": CLASS_MAPPER[cls],
                    "id_cad": f"synthetic_{i}",
                    "trs": {"translation": [float(v) for v in c],
                            "rotation": yaw_quat(yaw),
                            "scale": [1.0, 1.0, 1.0]},
                    "bbox": [float(v) for v in dims / 2],
                }
                for i, (c, dims, yaw, cls, _) in enumerate(objects)
            ],
        })

    with open(os.path.join(root, "full_annotations.json"), "w") as f:
        json.dump(annotations, f)
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(SCENES) + "\n")
    with open(os.path.join(root, "rehearsal.yaml"), "w") as f:
        f.write(YAML)
    n = sum(len(os.listdir(os.path.join(scans, s, "frames", "color"))) for s in SCENES)
    print(f"wrote {len(SCENES)} scenes, {n} frames, {IMG}x{IMG}, to {root}")


def main_hard(root: str, seeds=None, n_frames=None) -> None:
    """Write the HARD (discriminative) val split: procedural 8-10-object
    scenes with same-class duplicates, texture, occlusion, border
    truncation, and pose noise (see hard.py).  Same on-disk layout as
    :func:`main`; evaluation seeds only — training uses held-out seeds via
    train.py's ODAM_HARD mode.  ``seeds`` overrides EVAL_SEEDS (used by
    --tune to emit the operating-point tuning split, hard.TUNE_SEEDS —
    thresholds are selected there, never on the eval scenes)."""
    from hard import (EVAL_SEEDS, IMG as IMG_HARD, K as K_HARD,
                      hard_scene_annotation, hard_scene_id, hard_scene_views)

    if seeds is None:
        seeds = EVAL_SEEDS

    scans = os.path.join(root, "scans")
    annotations = []
    K44 = np.eye(4)
    K44[:3, :3] = K_HARD
    aa_line = "axisAlignment = " + " ".join(str(v) for v in np.eye(4).reshape(-1))

    scene_ids = []
    for seed in seeds:
        scene_id = hard_scene_id(seed)
        scene_ids.append(scene_id)
        base = os.path.join(scans, scene_id, "frames")
        for sub in ("color", "pose", "intrinsic"):
            os.makedirs(os.path.join(base, sub), exist_ok=True)
        np.savetxt(os.path.join(base, "intrinsic", "intrinsic_color.txt"), K44)
        with open(os.path.join(scans, scene_id, f"{scene_id}.txt"), "w") as f:
            f.write(aa_line + "\n")
        view_kwargs = {} if n_frames is None else {"n_frames": n_frames}
        for fid, T_wc, img, _, _ in hard_scene_views(seed, **view_kwargs):
            Image.fromarray(img).save(
                os.path.join(base, "color", f"{fid}.jpg"), quality=95
            )
            np.savetxt(os.path.join(base, "pose", f"{fid}.txt"), T_wc)
        annotations.append(hard_scene_annotation(seed))

    with open(os.path.join(root, "full_annotations.json"), "w") as f:
        json.dump(annotations, f)
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(scene_ids) + "\n")
    with open(os.path.join(root, "rehearsal.yaml"), "w") as f:
        # more query slots + 192px frames for the crowded scenes; stage-3
        # backbone features (12x12 grid) — stage 4's whole-image receptive
        # field makes held-out-layout generalization impossible for the
        # tiny frozen-random-backbone model (measured: tp 243/249 on train
        # layouts vs ~35% tp + 60% class error on eval layouts)
        f.write(YAML.replace("num_queries: 12", "num_queries: 16")
                    .replace('backbone: "resnet50"', 'backbone: "tiny"')
                    .replace("dilation: False",
                             "dilation: False\nbackbone_stage: 3")
                    .replace("img_h: 128", f"img_h: {IMG_HARD}")
                    .replace("img_w: 128", f"img_w: {IMG_HARD}"))
    n = sum(len(os.listdir(os.path.join(scans, s, "frames", "color")))
            for s in scene_ids)
    print(f"wrote {len(scene_ids)} HARD scenes, {n} frames, "
          f"{IMG_HARD}x{IMG_HARD}, to {root}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--tune" in sys.argv:
        from hard import TUNE_SEEDS

        main_hard(args[0] if args else
                  os.path.join(os.path.dirname(__file__), "data_hard_tune"),
                  seeds=TUNE_SEEDS)
    elif "--long" in sys.argv:
        # Long-stream eval split for the associator-window experiment
        # (same layouts/eval seeds as --hard, one slow 480-frame orbit):
        # tracks accumulate ~15x more observations than the 32-frame split,
        # so the 100-row window (the reference's bound,
        # src/processor.py:133-178) actually truncates history and
        # window=400 (flash-kernel regime) is a real capability delta.
        main_hard(args[0] if args else
                  os.path.join(os.path.dirname(__file__), "data_hard_long"),
                  n_frames=480)
    elif "--hard" in sys.argv:
        main_hard(args[0] if args else
                  os.path.join(os.path.dirname(__file__), "data_hard"))
    else:
        main(args[0] if args else
             os.path.join(os.path.dirname(__file__), "data"))
