"""Train the tiny rehearsal detector + associator from scratch (TPU).

Crash-isolated segments with orbax resume (this environment's TPU worker can
die under sustained training load; each segment picks up from the checkpoint):

    for s in 0 1 2 3 4 5 6 7 8 9; do
      python examples/cli_rehearsal/train.py detector $s 400 rehearsal_detr_ckpt
    done
    python examples/cli_rehearsal/train.py associator 0 400 rehearsal_assoc_ckpt

The associator trains at the PIPELINE's input geometry — window 100,
detections padded to 30 (padded det rows participate in attention, matching
the reference collater) — so inference is in-distribution.
"""
import os
import sys
import time

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # this image's axon TPU plugin wins over the env var alone (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))

from odam_tpu.utils import compile_cache, checkpoint  # noqa: E402

compile_cache.enable()

from common import IMG, SCENES, scene_views, make_detr, make_assoc, norm, gt_world_tracks  # noqa: E402

HARD = os.environ.get("ODAM_HARD") == "1"


def _train_views():
    """(img, rows) training views — standard scenes, or the hard split's
    held-out layout seeds (ODAM_HARD=1; eval scenes use different seeds,
    so generalization is over layouts, not camera phases alone)."""
    views = []
    if HARD:
        from hard import TRAIN_SEEDS, hard_scene_views

        for seed in TRAIN_SEEDS:
            for phase in (0.0, 0.5):
                for _, _, img, rows, _ in hard_scene_views(seed, phase=phase):
                    if len(rows):
                        views.append((img, rows))
    else:
        for scene_id in SCENES:
            # two camera rings offset from the on-disk eval ring (phase 0.0)
            for phase in (0.3, 0.65):
                for _, _, img, rows in scene_views(scene_id, phase=phase):
                    if len(rows):
                        views.append((img, rows))
    return views


def train_detector(seg: int, steps: int, ckpt: str) -> None:
    """Full end-to-end detector training (backbone included).

    HARD mode trains the lightweight trainable backbone
    (models/resnet.TinyBackbone) on freshly generated layouts every step
    (hard.hard_random_view): the frozen-random-ResNet feature cache cannot
    generalize over held-out layouts (measured 98% vs 33% recall), so the
    hard split's detector is the e2e one.
    """
    from odam_tpu.models import criterion as crit_mod, training as train_mod
    from odam_tpu.data.datasets import pack_targets

    if HARD:
        from hard import IMG as img_size, hard_random_view

        model, cfg = make_detr(16, backbone_stage=3, backbone="tiny")
    else:
        img_size = IMG
        views = _train_views()
        model, cfg = make_detr(12)
    if checkpoint.latest_path(ckpt):
        # restore against abstract shapes: skips compiling the init program
        # (~150 s through this environment's remote compiler)
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((1, img_size, img_size, 3))),
            jax.random.key(0),
        )
        params = checkpoint.restore(ckpt, shapes)
        # Verify the CLI segment against the checkpoint's own position: a
        # wrong seg silently trains with a wrong cosine offset and corrupts
        # the declared 18k-step provenance (ADVICE r3).  Legacy checkpoints
        # without odam_meta.json fall back to trusting the argument.
        meta = checkpoint.load_meta(ckpt)
        start_it = 0
        if meta is not None and "global_step" in meta:
            at = int(meta["global_step"])
            # exact boundary (at == seg*steps) or a mid-segment bank left by
            # a crash (seg*steps < at < (seg+1)*steps) both resume seg; a
            # bank from any other segment is a provenance error
            if at // steps != seg and at != seg * steps:
                raise SystemExit(
                    f"checkpoint {ckpt} is at global step {at}; segment "
                    f"{seg} of {steps}-step segments expects "
                    f"[{seg * steps}, {(seg + 1) * steps}). Resume with "
                    f"seg {at // steps} (see TRAINLOG.md)."
                )
            # a mid-segment bank resumes AT ITS BANKED STEP: re-running the
            # whole segment on banked weights would double-train the banked
            # prefix and break the declared 18k-step provenance.  (Each
            # segment runs a fresh optimizer over params; the cosine offset
            # below is per-iteration, so a partial segment stays on
            # schedule.)
            start_it = at - seg * steps
            if start_it:
                print(f"mid-segment bank: resuming segment {seg} at "
                      f"step {start_it}/{steps}")
        else:
            print(f"WARNING: {ckpt} carries no global_step meta; trusting "
                  f"seg={seg} (verify against artifacts/TRAINLOG.md)")
        print(f"resumed from {ckpt}")
    else:
        start_it = 0
        params = model.init(jax.random.key(0),
                            jnp.zeros((1, img_size, img_size, 3)))
    lr = float(os.environ.get("ODAM_LR", "5e-4"))
    decay_steps = int(os.environ.get("ODAM_DECAY_STEPS", "0"))
    if decay_steps:
        import optax

        base = optax.cosine_decay_schedule(lr, decay_steps, alpha=0.02)
        # crash-isolated segments resume MID-schedule: segment s of n steps
        # starts at global step s*n (+ the banked step on a mid-segment
        # resume); the optimizer is fresh per run, so its count starts at 0
        offset = seg * steps + start_it
        lr = lambda count: base(count + offset)  # noqa: E731
    tcfg = train_mod.DetrTrainConfig(
        lr=lr, lr_backbone=lr, clip_norm=5.0, weight_decay=0.0,
        criterion=crit_mod.CriterionConfig(num_classes=cfg.num_classes),
    )
    tx = train_mod.make_detr_optimizer(params, tcfg)
    state = train_mod.init_train_state(params, tx)
    step_fn = train_mod.make_detr_train_step(model, tx, tcfg)
    # fresh layouts every step: a partial-segment resume just needs a data
    # stream disjoint from the already-trained prefix, not a replay of it
    rng = np.random.default_rng(seg if not start_it
                                else seg * 100003 + start_it)
    B = int(os.environ.get("ODAM_TRAIN_BATCH", "8"))
    t0 = time.time()
    for it in range(start_it, steps):
        if HARD:
            batch = []
            while len(batch) < B:
                img, rows = hard_random_view(rng)
                if len(rows):
                    batch.append((img, rows))
            imgs = np.stack([norm(v[0]) for v in batch])
            targets = pack_targets([v[1] for v in batch], 12)
        else:
            idx = rng.integers(0, len(views), B)
            imgs = np.stack([norm(views[i][0]) for i in idx])
            targets = pack_targets([views[i][1] for i in idx], 8)
        targets = crit_mod.Targets(*[jnp.asarray(x) for x in targets])
        state, m = step_fn(state, jnp.asarray(imgs), targets,
                           jax.random.key(seg * 10000 + it))
        if (it + 1) % int(os.environ.get("ODAM_BANK", "150")) == 0:
            # bank progress: the TPU worker kernel-faults after a few hundred
            # sustained train steps; a crashed segment keeps what it saved
            checkpoint.save(ckpt, state.params,
                            meta={"global_step": seg * steps + it + 1,
                                  "seg": seg, "seg_steps": steps})
            print(f"  banked at step {it + 1}, loss {float(m['total']):.2f}",
                  flush=True)
    total = float(m["total"])  # forces completion
    checkpoint.save(ckpt, state.params,
                    meta={"global_step": (seg + 1) * steps,
                          "seg": seg, "seg_steps": steps})
    print(f"detector segment {seg}: {steps} steps in {time.time() - t0:.0f}s, "
          f"loss {total:.2f}")


class _DETRHead:
    """Post-backbone DETR (transformer + heads) over cached features.

    Param paths mirror odam_tpu.models.detr.DETR exactly (transformer,
    input_proj, query_embed, class_embed, *_embed), so the trained subtree
    grafts into the full model's params for inference.  Frozen-(random)-
    backbone training is the limit case of the reference's 0.1x backbone lr;
    it keeps the train step tiny enough for this environment (the TPU worker
    kernel-faults on the full fwd+bwd; this head trains on the 1-core CPU).
    """

    def __init__(self, cfg):
        import flax.linen as nn

        from odam_tpu.models import position
        from odam_tpu.models.detr import HeadMLP
        from odam_tpu.models.transformer import Transformer

        c = cfg

        class Head(nn.Module):
            @nn.compact
            def __call__(self, feats):
                B, fh, fw, _ = feats.shape
                feat_mask = jnp.zeros((B, fh, fw), bool)
                pos = position.sine_position_encoding(
                    feat_mask, num_pos_feats=c.hidden_dim // 2, dtype=c.dtype
                )
                src = nn.Conv(c.hidden_dim, (1, 1), dtype=c.dtype,
                              name="input_proj")(feats)
                query_embed = self.param(
                    "query_embed", nn.initializers.normal(1.0),
                    (c.num_queries, c.hidden_dim),
                )
                hs, _ = Transformer(
                    d_model=c.hidden_dim, num_heads=c.nheads,
                    num_encoder_layers=c.enc_layers,
                    num_decoder_layers=c.dec_layers,
                    dim_feedforward=c.dim_feedforward, dropout=c.dropout,
                    dtype=c.dtype, name="transformer",
                )(src, feat_mask, query_embed, pos)
                heads = {
                    "pred_logits": nn.Dense(c.num_classes + 1, dtype=c.dtype,
                                            name="class_embed")(hs),
                    "pred_boxes": jax.nn.sigmoid(
                        HeadMLP(c.hidden_dim, 4, dtype=c.dtype, name="bbox_embed")(hs)),
                    "pred_offset": HeadMLP(c.hidden_dim, 2, dtype=c.dtype,
                                           name="offset_embed")(hs),
                    "pred_angle": HeadMLP(c.hidden_dim, c.num_angle_bins,
                                          dtype=c.dtype, name="angle_embed")(hs),
                    "pred_size": HeadMLP(c.hidden_dim, 3, dtype=c.dtype,
                                         name="size_embed")(hs),
                    "pred_depth": HeadMLP(c.hidden_dim, 1, dtype=c.dtype,
                                          name="depth_embed")(hs),
                }
                out = {k: v[-1] for k, v in heads.items()}
                out["aux_outputs"] = [
                    {k: v[i] for k, v in heads.items()}
                    for i in range(hs.shape[0] - 1)
                ]
                return out

        self.module = Head()


def train_detector_frozen(seg: int, steps: int, ckpt: str) -> None:
    """Train transformer+heads on cached frozen-backbone features (CPU-friendly)."""
    import optax

    from odam_tpu.models import criterion as crit_mod, resnet
    from odam_tpu.data.datasets import pack_targets

    model, cfg = make_detr(16 if HARD else 12,
                           backbone_stage=3 if HARD else 4)
    img_size = __import__("hard").IMG if HARD else IMG
    full = model.init(jax.random.key(0), jnp.zeros((1, img_size, img_size, 3)))
    if checkpoint.latest_path(ckpt):
        full = checkpoint.restore(ckpt, full)
        print(f"resumed from {ckpt}")

    # cache backbone features for every train view (one-time inference)
    feat_cache = os.path.join(
        os.path.dirname(ckpt),
        f"rehearsal_feats_hard_s{cfg.backbone_stage}.npz" if HARD
        else "rehearsal_feats.npz",
    )
    views = _train_views()
    if os.path.exists(feat_cache):
        feats = np.load(feat_cache)["feats"]
    else:
        backbone = resnet.ResNet(
            stage_sizes=resnet.RESNET50_STAGES,
            return_stages=(cfg.backbone_stage,), dtype=jnp.float32,
        )
        bb_params = {"params": full["params"]["backbone"]}
        fwd = jax.jit(
            lambda imgs: backbone.apply(bb_params, imgs)[cfg.backbone_stage]
        )
        outs = []
        for start in range(0, len(views), 16):
            imgs = np.stack([norm(v[0]) for v in views[start:start + 16]])
            outs.append(np.asarray(fwd(jnp.asarray(imgs))))
        feats = np.concatenate(outs)
        np.savez(feat_cache, feats=feats)
        print(f"cached {feats.shape} backbone features")

    head = _DETRHead(cfg).module
    head_params = {
        "params": {
            k: full["params"][k] for k in full["params"] if k != "backbone"
        }
    }
    tcfg = crit_mod.CriterionConfig(num_classes=cfg.num_classes)
    lr = float(os.environ.get("ODAM_LR", "5e-4"))
    decay_steps = int(os.environ.get("ODAM_DECAY_STEPS", "0"))
    sched = (
        optax.cosine_decay_schedule(lr, decay_steps, alpha=0.02)
        if decay_steps else lr
    )
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(sched))
    opt_state = tx.init(head_params)

    def loss_fn(p, f, targets):
        out = head.apply(p, f)
        total, metrics = crit_mod.set_criterion(out, targets, tcfg)
        return total, metrics

    @jax.jit
    def step_fn(p, s, f, targets):
        (total, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(p, f, targets)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s, total

    def merged():
        return {"params": {**head_params["params"],
                           "backbone": full["params"]["backbone"]}}

    rng = np.random.default_rng(seg)
    B = int(os.environ.get("ODAM_TRAIN_BATCH", "8"))
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(0, len(views), B)
        f = jnp.asarray(feats[idx])
        targets = crit_mod.Targets(*[
            jnp.asarray(x) for x in pack_targets([views[i][1] for i in idx], 12 if HARD else 8)
        ])
        head_params, opt_state, total = step_fn(head_params, opt_state, f, targets)
        if (it + 1) % int(os.environ.get("ODAM_BANK", "500")) == 0:
            checkpoint.save(ckpt, merged(),
                            meta={"global_step": seg * steps + it + 1,
                                  "seg": seg, "seg_steps": steps})
            print(f"  banked at step {it + 1}, loss {float(total):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    checkpoint.save(ckpt, merged(),
                    meta={"global_step": (seg + 1) * steps,
                          "seg": seg, "seg_steps": steps})
    print(f"frozen-head segment {seg}: {steps} steps in {time.time() - t0:.0f}s, "
          f"loss {float(total):.2f}")


def _ghost_rows(fid: float, T_wc: np.ndarray, rng: np.random.Generator,
                rate: float = 0.7) -> np.ndarray | None:
    """0-2 transient false-positive detection rows (82-dim) for one frame.

    Each ghost is a geometrically self-consistent detection of an object
    that does not exist — fresh random geometry every frame, so no two
    ghosts are the same object and the dustbin target is always correct
    supervision (a persistent ghost would wrongly teach non-attachment of
    consistent observations).
    """
    from common import box_corners_np, cam_azi_np
    from hard import CLASS_DIMS, IMG as HIMG, K as HK

    if rng.random() > rate:
        return None
    rows = []
    for _ in range(int(rng.integers(1, 3))):
        cls = int(rng.integers(0, 8))
        dims = np.asarray(CLASS_DIMS[cls]) * rng.uniform(0.7, 1.3, 3)
        c = np.array([rng.uniform(-1.8, 1.8), rng.uniform(-1.8, 1.8),
                      dims[2] / 2])
        yaw = float(rng.uniform(0, np.pi))
        T_cw = np.linalg.inv(T_wc)
        pc = box_corners_np(dims, yaw, c) @ T_cw[:3, :3].T + T_cw[:3, 3]
        if pc[:, 2].min() < 0.3:
            continue
        uv = pc @ HK.T
        uv = uv[:, :2] / uv[:, 2:]
        x0, y0 = uv.min(0)
        x1, y1 = uv.max(0)
        if min(x1, HIMG) - max(x0, 0) < 5 or min(y1, HIMG) - max(y0, 0) < 5:
            continue
        row = np.full((82,), -1.0, np.float32)
        row[0] = fid
        row[1] = cls
        row[2:6] = [x0, y0, x1, y1]
        row[6:9] = dims
        row[9:12] = c
        row[12] = yaw
        # Same score band as the (jittered) real rows: score must NOT
        # separate ghosts from real detections, or the model learns a
        # score->dustbin shortcut and rejects real low-score detections
        # at inference (measured: recall 0.417 -> 0.333 with a 0.6-0.9
        # ghost band against 0.95 real rows).
        row[13] = float(rng.uniform(0.6, 1.0))
        row[78:82] = row[2:6]
        rows.append(row)
    return np.stack(rows) if rows else None


def train_associator(seg: int, steps: int, ckpt: str) -> None:
    import optax

    from odam_tpu.data.datasets import build_association_sample
    from odam_tpu.models import training as train_mod

    # dets padded to 30, window 100 (ODAM_WINDOW overrides: the GNN is
    # length-agnostic, but the w400 experiment fine-tunes at the long
    # window so attention-mass dilution over 4x rows is in-distribution)
    T, N, W = (16 if HARD else 8), 30, int(os.environ.get("ODAM_WINDOW", "100"))
    samples = []
    rng = np.random.default_rng(7)
    if HARD:
        import hard as hard_mod
        from hard import IMG as img_size, TRAIN_SEEDS, hard_gt_world_tracks

        # Domain-match the training stream to what the pipeline's associator
        # actually receives (the recall ladder measured fragmentation as the
        # association stage's loss — 0.750 -> 0.667 on oracle detections):
        # 1. visibility-gate track rows with the detectability criterion —
        #    a detector cannot observe occluded/truncated objects, so real
        #    track histories have OCCLUSION GAPS; dense GT histories never
        #    taught re-attachment after a gap;
        # 2. inject transient false-positive detections (ghost rows) that
        #    must map to the dustbin — the measured detector emits ~5
        #    fp/frame, GT-derived streams contain none.
        import analyze_visibility as av

        # ODAM_STREAM_FRAMES: orbit length of the training streams.  The
        # default 32-frame split caps every track at <=32 rows, so a long
        # window is never exercised; the w400 experiment trains on 480-frame
        # orbits (fewer layout seeds keep the sample count comparable).
        stream_frames = int(os.environ.get("ODAM_STREAM_FRAMES",
                                           str(hard_mod.N_FRAMES_HARD)))
        long_stream = stream_frames != hard_mod.N_FRAMES_HARD
        seeds = TRAIN_SEEDS[:2] if long_stream else TRAIN_SEEDS
        sources = []
        for seed in seeds:
            _, flags, _, _ = av.visible_flags(seed, n_frames=stream_frames)

            def keep(fid, inst, flags=flags):
                return bool(flags[fid, inst])

            for ns in range(2):
                tracks, poses = hard_gt_world_tracks(
                    seed, np.random.default_rng(ns), noise=0.05, keep=keep,
                    n_frames=stream_frames)
                # score jitter: GT rows carry a constant 0.95; real
                # detections span the whole kept band.  Matched to the
                # ghost band so score carries no real-vs-fp signal.
                srng = np.random.default_rng(1000 + seed * 10 + ns)
                for t in tracks:
                    t[:, 13] = srng.uniform(0.6, 1.0, len(t))
                sources.append((tracks, poses))
    else:
        img_size = IMG
        sources = [
            gt_world_tracks(scene_id, np.random.default_rng(ns), noise=0.03)
            for scene_id in SCENES for ns in range(4)
        ]
    ghost_rng = np.random.default_rng(17)
    for tracks, poses in sources:
        for fid, T_wc in poses.items():
            if fid == 0:
                continue
            extra = (_ghost_rows(float(fid), T_wc, ghost_rng)
                     if HARD else None)
            s = build_association_sample(
                tracks, float(fid), T, N, W,
                T_wc=T_wc, img_w=float(img_size), img_h=float(img_size),
                extra_dets=extra,
            )
            if s is not None:
                P = 32 if HARD else 16  # pad variable-length gt pairs
                pairs = np.zeros((P, 2), np.int32)
                valid = np.zeros((P,), bool)
                k = min(len(s["gt_pairs"]), P)
                pairs[:k] = s["gt_pairs"][:k]
                valid[:k] = True
                s["gt_pairs"], s["pair_valid"] = pairs, valid
                samples.append(s)
    print(f"{len(samples)} association samples")

    model, _ = make_assoc()
    s0 = samples[0]
    params = model.init(
        jax.random.key(0),
        jnp.asarray(s0["tracks"][None]), jnp.asarray(s0["track_mask"][None]),
        jnp.asarray(s0["detections"][None]), jnp.asarray(s0["det_mask"][None]),
    )
    if checkpoint.latest_path(ckpt):
        params = checkpoint.restore(ckpt, params)
        print(f"resumed from {ckpt}")
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    state = train_mod.init_train_state(params, tx)
    step_fn = train_mod.make_assoc_train_step(model, tx)
    B = 16
    t0 = time.time()
    for it in range(steps):
        idx = rng.integers(0, len(samples), B)
        batch = {
            k: jnp.asarray(np.stack([samples[i][k] for i in idx]))
            for k in ("tracks", "track_mask", "detections", "det_mask",
                      "gt_pairs", "pair_valid")
        }
        state, loss = step_fn(state, *batch.values())
    final = float(loss)
    checkpoint.save(ckpt, state.params,
                    meta={"global_step": (seg + 1) * steps, "seg": seg,
                          "seg_steps": steps})
    print(f"associator segment {seg}: {steps} steps in {time.time() - t0:.0f}s, "
          f"nll {final:.3f}")


if __name__ == "__main__":
    kind, seg, steps, ckpt = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    ckpt = os.path.abspath(ckpt)
    if kind == "detector":
        train_detector(seg, steps, ckpt)
    elif kind == "detector_frozen":
        train_detector_frozen(seg, steps, ckpt)
    else:
        train_associator(seg, steps, ckpt)
