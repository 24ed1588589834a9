"""Evaluate the segment-trained detector through the full pipeline."""
import os, sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))
from odam_tpu.utils import compile_cache, checkpoint
compile_cache.enable()
from closed_scene import make_train_views, make_detr, norm, render, look_at, OBJECTS, K, IMG
from odam_tpu.models import detr as detr_mod, associator as assoc_mod
from odam_tpu.runtime import processor as proc_mod
from odam_tpu.utils import geometry as geo, host_boxes

model, cfg = make_detr()
params = model.init(jax.random.key(0), jnp.zeros((1, IMG, IMG, 3)))
params = checkpoint.restore(os.path.abspath("closed_loop_ckpt"), params)

# held-out view detection quality
phi = 0.31
cam = np.array([0.4+3.2*np.cos(phi), 0.5+3.2*np.sin(phi), 1.6])
T_wc = look_at(cam, np.array([0.4,0.5,0.4])).astype(np.float32)
img, gt = render(T_wc)
out = model.apply(params, jnp.asarray(norm(img))[None])
dets = detr_mod.postprocess(out, jnp.asarray(float(IMG)), jnp.asarray(float(IMG)),
                            jnp.asarray(0.6), jnp.asarray(K), max_dets=8)
v = np.asarray(dets.valid[0])
print(f"held-out: {v.sum()} detections (gt {len(gt)}); classes",
      np.asarray(dets.classes[0])[v], "gt", gt[:,0].astype(int))
print("scores:", np.round(np.asarray(dets.scores[0])[v], 2))
print("t_co:", np.round(np.asarray(dets.t_co[0])[v], 2))

# class-keyed oracle associator (objects have unique classes)
from odam_tpu.models.associator import AssociatorOutput
class ClassOracle:
    def apply(self, p, tracks79, track_mask, det79, det_mask, thr):
        t = tracks79[0]; valid = t[..., 0] >= 0
        w = valid.astype(jnp.float32)
        t_cls = jnp.sum(t[..., 1]*w, axis=1)/jnp.maximum(w.sum(1), 1)
        d_cls = det79[0][:, 1]
        ok = (jnp.abs(t_cls[:,None]-d_cls[None,:])<0.5) & track_mask[0][:,None] & det_mask[0][None,:]
        T, N = ok.shape
        match = jnp.where(ok.any(0) & det_mask[0], jnp.argmax(ok, 0), -1)
        Z = jnp.full((T+1, N+1), -20.0).at[T, :].set(0.0)
        Z = Z.at[jnp.where(match>=0, match, T), jnp.arange(N)].set(0.0)
        return AssociatorOutput(Z[None], ok[None].astype(jnp.float32), match[None])

pcfg = proc_mod.PipelineConfig(detect_threshold=0.6, score_threshold=0.8,
    max_tracks=8, max_dets=8, window=16, track_bbox_samples=128,
    optim_iters=200, optim_samples=400, min_views=5, max_objs=8, max_views=32,
    max_log_frames=64)
pipe = proc_mod.OdamPipeline(model, params, ClassOracle(), {}, pcfg)
pipe.init_sequence(K, IMG, IMG)
for k in range(24):
    phi = 2*np.pi*(k+0.5)/24
    cam = np.array([0.4+3.2*np.cos(phi), 0.5+3.2*np.sin(phi), 1.6])
    T_wc = look_at(cam, np.array([0.4,0.5,0.4])).astype(np.float32)
    img, _ = render(T_wc)
    pipe.process_frame(norm(img).astype(np.float32), k, T_wc)
tracks = pipe.tracks
print(f"pipeline: {len(tracks)} tracks, lengths {[len(t) for t in tracks]}")
out = pipe.optim_process(tracks)
merged = pipe.merge_process(out)
out = pipe.optim_process(merged)
tp = 0
for track, corners in zip(out["tracks"], out["bboxes_qc"]):
    cls = int(np.median(track[:,1]))
    m = [o for o in OBJECTS if o[3] == cls]
    if not m: continue
    c, dims, yaw, _, _ = m[0]
    gt_c = np.asarray(geo.box3d_corners(jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(c)))
    iou, _ = host_boxes.box3d_iou(np.asarray(corners, np.float64), gt_c)
    print(f"  class {cls}: mapped-box IoU vs GT = {iou:.3f}")
    if iou > 0.25: tp += 1
print(f"CLOSED LOOP RESULT: {tp}/{len(OBJECTS)} objects at oriented-3D-IoU > 0.25")
