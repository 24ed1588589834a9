"""Associator learning closed loop: train on synthetic tracks, verify the
matching F1 on held-out scenes improves substantially over the random init.
(The reference's training capability was dormant; this proves ours works.)"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from odam_tpu.data import datasets
from odam_tpu.eval import association
from odam_tpu.models import associator as assoc_mod, training as train_mod
from scripts.train_associator import synthetic_scenes


def test_associator_learns_to_match():
    rng = np.random.default_rng(0)
    train_sc = synthetic_scenes(rng, n_scenes=4, n_tracks=4, n_frames=24)
    test_sc = synthetic_scenes(np.random.default_rng(99), n_scenes=1,
                               n_tracks=4, n_frames=24)["synthetic_0"]

    acfg = assoc_mod.AssociatorConfig(
        descriptor_dim=64, keypoint_encoder=(78, 64, 64),
        gnn_layers=("self", "cross", "self", "cross"),
        self_gnn_layers=("self",), sinkhorn_iterations=30,
    )
    model = assoc_mod.Associator(acfg)
    ds = datasets.AssociatorDataset(train_sc, max_tracks=6, max_dets=5, window=10)
    s = ds.get(0)
    params = model.init(
        jax.random.key(0),
        jnp.asarray(s["tracks"][None]), jnp.asarray(s["track_mask"][None]),
        jnp.asarray(s["detections"][None]), jnp.asarray(s["det_mask"][None]),
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
    state = train_mod.init_train_state(params, tx)
    step_fn = train_mod.make_assoc_train_step(model, tx)

    kw = dict(max_tracks=6, max_dets=5, window=10)
    before = association.evaluate_scene(model, state.params, test_sc, **kw)

    batches = ds.batches(16, rng)
    first_loss = last_loss = None
    for it in range(250):
        b = next(batches)
        arrs = [jnp.asarray(b[k]) for k in
                ("tracks", "track_mask", "detections", "det_mask",
                 "gt_pairs", "pair_valid")]
        state, loss = step_fn(state, *arrs)
        if first_loss is None:
            first_loss = float(loss)
        last_loss = float(loss)

    assert last_loss < first_loss * 0.2, (first_loss, last_loss)
    after = association.evaluate_scene(model, state.params, test_sc, **kw)
    assert after.f1 > before.f1 + 0.05, (before.f1, after.f1)
    assert after.f1 > 0.7, after.f1
