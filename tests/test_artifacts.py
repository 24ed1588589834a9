"""Committed trained-artifact guards (artifacts/README.md).

The hard-rehearsal checkpoints under artifacts/ back every MEASURED.md
hard-split number and the operating-point tooling; this environment's
scratch wipe makes the committed copies the only durable ones.  These
tests fail if a commit ships a wrong/truncated checkpoint (e.g. a
mid-save state or a mismatched architecture) rather than the model the
docs describe.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
ASSOC = os.path.join(ROOT, "artifacts", "rehearsal_hard_assoc_ckpt")
DETR = os.path.join(ROOT, "artifacts", "rehearsal_hard_detr_ckpt")


@pytest.fixture(autouse=True)
def _rehearsal_env(monkeypatch):
    """Scope the hard-rehearsal env + import path to these tests: a module-
    level mutation leaks into the whole pytest process and makes any module
    that reads ODAM_HARD at import (train.py) order-dependent (ADVICE r3)."""
    monkeypatch.setenv("ODAM_HARD", "1")
    monkeypatch.syspath_prepend(os.path.join(ROOT, "examples", "cli_rehearsal"))


def test_committed_associator_restores_and_separates():
    """Restore the committed associator and check it beats chance by a wide
    margin on a held-out (eval-seed) association batch — guards against a
    truncated orbax dir or an architecture drift that silently reinits."""
    from common import make_assoc
    from hard import IMG, EVAL_SEEDS, hard_gt_world_tracks
    from odam_tpu.data.datasets import build_association_sample
    from odam_tpu.models import associator as assoc_mod
    from odam_tpu.utils import checkpoint

    if not checkpoint.latest_path(ASSOC):
        pytest.skip("associator artifact not committed")

    T, N, W, P = 16, 30, 100, 32
    samples = []
    seed = EVAL_SEEDS[0]
    tracks, poses = hard_gt_world_tracks(
        seed, np.random.default_rng(seed), noise=0.05)
    for fid, T_wc in poses.items():
        if fid == 0:
            continue
        s = build_association_sample(
            tracks, float(fid), T, N, W, T_wc=T_wc,
            img_w=float(IMG), img_h=float(IMG))
        if s is None:
            continue
        pairs = np.zeros((P, 2), np.int32)
        valid = np.zeros((P,), bool)
        k = min(len(s["gt_pairs"]), P)
        pairs[:k] = s["gt_pairs"][:k]
        valid[:k] = True
        s["gt_pairs"], s["pair_valid"] = pairs, valid
        samples.append(s)
        if len(samples) == 8:
            break
    assert len(samples) == 8

    model, _ = make_assoc()
    s0 = samples[0]
    init = jax.eval_shape(
        lambda k: model.init(
            k, jnp.asarray(s0["tracks"][None]),
            jnp.asarray(s0["track_mask"][None]),
            jnp.asarray(s0["detections"][None]),
            jnp.asarray(s0["det_mask"][None])),
        jax.random.key(0))
    params = checkpoint.restore(ASSOC, init)

    keys = ("tracks", "track_mask", "detections", "det_mask",
            "gt_pairs", "pair_valid")
    batch = [jnp.asarray(np.stack([s[k] for s in samples])) for k in keys]
    out = model.apply(params, *batch[:4])
    n = jnp.maximum(batch[5].sum(), 1)
    nll = float(assoc_mod.association_nll(
        out.log_assignment, batch[4], batch[5]) / n)
    # chance over a 16x(30+1) assignment is ~log(17)=2.8 nats/pair; the
    # trained model measured 0.145 on the full eval stream (validate.py)
    assert nll < 0.5, f"committed associator NLL {nll:.3f} looks untrained"


def test_committed_detector_restores_against_declared_architecture():
    """The committed detector (possibly a partial segment — TRAINLOG.md)
    must restore against the exact architecture the docs declare
    (tiny backbone, stage 3, 16 queries)."""
    from common import make_detr
    from hard import IMG
    from odam_tpu.utils import checkpoint

    if not checkpoint.latest_path(DETR):
        pytest.skip("detector artifact not committed")

    model, _ = make_detr(16, backbone_stage=3, backbone="tiny")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, IMG, IMG, 3))),
        jax.random.key(0))
    params = checkpoint.restore(DETR, shapes)
    out = model.apply(params, jnp.zeros((1, IMG, IMG, 3)))
    assert out["pred_logits"].shape[1] == 16
    assert bool(jnp.isfinite(out["pred_logits"]).all())


def test_complete_detector_scores_its_operating_point():
    """Once TRAINLOG.md declares all 12 segments (global_step == 18000),
    the committed detector must score near its documented visible-object
    recall — a silently wrong/truncated bank must fail the suite, not just
    be 'reported' (VERDICT r3 weak #6).  Partial checkpoints skip."""
    from common import make_detr
    from hard import IMG, EVAL_SEEDS
    from odam_tpu.utils import checkpoint

    if not checkpoint.latest_path(DETR):
        pytest.skip("detector artifact not committed")
    meta = checkpoint.load_meta(DETR) or {}
    if (meta.get("global_step") or 0) < 18000:
        pytest.skip(f"partial checkpoint ({meta.get('global_step')}/18000)")

    import probe_detector

    model, _ = make_detr(16, backbone_stage=3, backbone="tiny")
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, IMG, IMG, 3))),
        jax.random.key(0))
    params = checkpoint.restore(DETR, shapes)
    tp, ce, fn, fp = probe_detector.stats(
        model, params, EVAL_SEEDS, n_frames=8, visible_only=True)
    recall = (tp + ce) / max(tp + ce + fn, 1)
    assert recall >= 0.84, (
        f"complete detector scores visible-recall {recall:.3f} < 0.84 "
        f"(tp={tp} ce={ce} fn={fn} fp={fp}): not the MEASURED.md model")
