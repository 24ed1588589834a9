"""Example: multi-view superquadric mapping on a synthetic posed-video scene.

No dataset or weights needed: builds noisy multi-view 2D box observations of
known 3D objects, packs them as tracks, optimizes superquadrics for all
objects at once, reports oriented-3D-IoU vs ground truth, and merges
duplicate tracks.  Run:  PYTHONPATH=. python examples/synthetic_mapping.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

from odam_tpu.mapping import constraints, optimizer, merge, prior, superquadric as sq
from odam_tpu.utils import geometry as geo, host_boxes

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
IMG_H, IMG_W = 480, 640

def look_at(cam, target):
    fwd = target - cam; fwd /= np.linalg.norm(fwd)
    up = np.array([0., 0., 1.]); right = np.cross(fwd, up); right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4); T[:3, 0] = right; T[:3, 1] = down; T[:3, 2] = fwd; T[:3, 3] = cam
    return T

# --- scene: 3 objects (chair, table, chair-fragment duplicate), 60 frames on an arc
objects = [  # (center, dims, yaw, class)
    (np.array([0.0, 0.0, 0.45]), np.array([0.55, 0.55, 0.9]), 0.3, 5),   # chair
    (np.array([1.6, 0.4, 0.35]), np.array([1.4, 0.8, 0.7]), -0.2, 1),    # table
]
n_frames = 60
frame_ids = np.arange(n_frames)
P_cws, tracks = [], []
rngn = np.random.default_rng(0)
for (center, dims, yaw, cls) in objects:
    tracks.append([])
tracks.append([])  # fragment of object 0

for f in range(n_frames):
    phi = 0.8 * np.pi * f / n_frames
    cam = np.array([2.8*np.cos(phi), 2.8*np.sin(phi), 1.4])
    T_wc = look_at(cam, np.array([0.8, 0.2, 0.5]))
    P = (K @ np.linalg.inv(T_wc)[:3, :]).astype(np.float32)
    P_cws.append(P)
    for oi, (center, dims, yaw, cls) in enumerate(objects):
        corners = np.asarray(geo.box3d_corners(jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center)))
        hom = np.concatenate([corners, np.ones((8,1))], 1)
        pix = hom @ P.T; uv = pix[:, :2] / pix[:, 2:]
        box = np.array([uv[:,0].min(), uv[:,1].min(), uv[:,0].max(), uv[:,1].max()])
        box += rngn.normal(0, 1.5, 4)  # detector noise in pixels
        row = np.zeros(82); row[0] = f; row[1] = cls
        row[2:6] = box
        row[6:9] = dims * rngn.uniform(0.85, 1.15, 3)
        row[9:12] = center + rngn.normal(0, 0.08, 3)
        row[12] = yaw + rngn.normal(0, 0.05)
        row[13] = 0.9
        dest = 0 if oi == 0 and f % 2 == 0 else (2 if oi == 0 else 1)
        tracks[dest].append(row)

tracks = [np.asarray(t) for t in tracks]
print(f"scene: {len(tracks)} tracks, lengths {[len(t) for t in tracks]}, {n_frames} frames")

sc = constraints.build_scene_constraints(tracks, frame_ids, np.asarray(P_cws), IMG_H, IMG_W,
                                         max_objs=8, max_views=64, min_views=10)
print("optimize_mask:", sc.optimize_mask, "n_views:", sc.n_views[:4])

init = sq.init_params(jnp.asarray(sc.init_translate), jnp.asarray(sc.init_angle),
                      jnp.asarray(sc.init_dims))
import time
res = optimizer.optimize_superquadrics(
    init, jnp.asarray(sc.boxes), jnp.asarray(sc.box_mask), jnp.asarray(sc.view_mask),
    jnp.asarray(sc.P_cw), jnp.asarray(sc.optimize_mask),
    jnp.asarray(prior.prior_invcov_for_classes(sc.obj_class)),
    n_iters=200, n_samples=500)
jax.block_until_ready(res.corners)
t0 = time.time()
res = optimizer.optimize_superquadrics(
    init, jnp.asarray(sc.boxes), jnp.asarray(sc.box_mask), jnp.asarray(sc.view_mask),
    jnp.asarray(sc.P_cw), jnp.asarray(sc.optimize_mask),
    jnp.asarray(prior.prior_invcov_for_classes(sc.obj_class)),
    n_iters=200, n_samples=500)
jax.block_until_ready(res.corners)
dt = time.time() - t0
print(f"optimization (8 obj slots x 200 iters x 500 pts, CPU): {dt:.2f}s")
print("loss: %.1f -> %.3f" % (res.loss_log[0], res.loss_log[-1]))

# IoU vs GT (slot order: longest first = track1(table,60), track0(chair,30), track2(chair,30))
gt = {}
for (center, dims, yaw, cls) in objects:
    gt[cls] = np.asarray(geo.box3d_corners(jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center)))
for slot in range(3):
    cls = int(sc.obj_class[slot])
    iou, _ = host_boxes.box3d_iou(np.asarray(res.corners[slot], np.float64), gt[cls])
    print(f"slot {slot} class {cls} n_views {sc.n_views[slot]}: oriented-3D-IoU vs GT = {iou:.3f}")

# merge: the two chair fragments should fuse
valid_slots = [i for i in range(len(sc.obj_valid)) if sc.obj_valid[i]]
slot_tracks = []
order = np.argsort([-len(t) for t in tracks])
for i, t_idx in enumerate(order[:len(valid_slots)]):
    slot_tracks.append(tracks[t_idx])
corners_list = [np.asarray(res.corners[i]) for i in range(len(slot_tracks))]
merged = merge.merge_tracks(slot_tracks, corners_list, frame_ids)
print(f"merge: {len(slot_tracks)} tracks -> {len(merged)} (chair fragments fused: {len(merged)==2})")
