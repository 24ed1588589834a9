"""Example: train the associator from scratch on synthetic tracks and
evaluate matching precision/recall/F1 on held-out scenes.
Run:  PYTHONPATH=. python examples/train_associator_synthetic.py
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import optax
from odam_tpu.models import associator as assoc_mod, training as train_mod
from odam_tpu.data import datasets
from odam_tpu.eval import association
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from scripts.train_associator import synthetic_scenes

rng = np.random.default_rng(0)
train_sc = synthetic_scenes(rng, n_scenes=6, n_tracks=5, n_frames=30)
test_sc = synthetic_scenes(np.random.default_rng(99), n_scenes=2, n_tracks=5, n_frames=30)

acfg = assoc_mod.AssociatorConfig(
    descriptor_dim=64, keypoint_encoder=(78, 64, 64),
    gnn_layers=("self", "cross", "self", "cross"), self_gnn_layers=("self",),
    sinkhorn_iterations=30,
)
model = assoc_mod.Associator(acfg)
ds = datasets.AssociatorDataset(train_sc, max_tracks=8, max_dets=6, window=12)
print(f"{len(ds)} train samples")
s = ds.get(0)
params = model.init(jax.random.key(0),
    jnp.asarray(s["tracks"][None]), jnp.asarray(s["track_mask"][None]),
    jnp.asarray(s["detections"][None]), jnp.asarray(s["det_mask"][None]))
tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-4))
state = train_mod.init_train_state(params, tx)
step_fn = train_mod.make_assoc_train_step(model, tx)

# baseline F1 (random weights)
m0 = association.evaluate_scene(model, state.params, test_sc["synthetic_0"],
                                max_tracks=8, max_dets=6, window=12)
print(f"before training: P {m0.precision:.2f} R {m0.recall:.2f} F1 {m0.f1:.2f}")

batches = ds.batches(16, rng)
import time
t0 = time.time()
for it in range(400):
    b = next(batches)
    arrs = [jnp.asarray(b[k]) for k in
            ("tracks","track_mask","detections","det_mask","gt_pairs","pair_valid")]
    state, loss = step_fn(state, *arrs)
    if (it+1) % 100 == 0:
        print(f"step {it+1}: nll {float(loss):.3f} ({time.time()-t0:.0f}s)")

for name, tracks in test_sc.items():
    m = association.evaluate_scene(model, state.params, tracks,
                                   max_tracks=8, max_dets=6, window=12)
    print(f"{name}: P {m.precision:.3f} R {m.recall:.3f} F1 {m.f1:.3f} ({m.n_frames} frames)")
