"""One crash-isolated training segment of the synthetic closed loop (TPU)."""
import sys, time, os, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.dirname(__file__))
from odam_tpu.utils import compile_cache, checkpoint
compile_cache.enable()
from odam_tpu.models import detr as detr_mod, criterion as crit_mod, training as train_mod
from odam_tpu.data.datasets import pack_targets
from closed_scene import make_train_views, make_detr, norm  # shared defs

seg = int(sys.argv[1]); steps = int(sys.argv[2]); ckpt = sys.argv[3]
train_views = make_train_views()
model, cfg = make_detr()
params = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))
if os.path.exists(ckpt):
    params = checkpoint.restore(ckpt, params)
    print(f"resumed from {ckpt}")
tcfg = train_mod.DetrTrainConfig(lr=5e-4, lr_backbone=5e-4, clip_norm=5.0, weight_decay=0.0,
    criterion=crit_mod.CriterionConfig(num_classes=8))
tx = train_mod.make_detr_optimizer(params, tcfg)
state = train_mod.init_train_state(params, tx)
step_fn = train_mod.make_detr_train_step(model, tx, tcfg)
rng = np.random.default_rng(seg)  # distinct batches per segment
B = 8
t0 = time.time()
for it in range(steps):
    idx = rng.integers(0, len(train_views), B)
    imgs = np.stack([norm(train_views[i][0]) for i in idx])
    targets = pack_targets([train_views[i][1] for i in idx], 8)
    targets = crit_mod.Targets(*[jnp.asarray(x) for x in targets])
    state, m = step_fn(state, jnp.asarray(imgs), targets, jax.random.key(seg*10000+it))
total = float(m["total"])  # forces completion
checkpoint.save(ckpt, state.params)
print(f"segment {seg}: {steps} steps in {time.time()-t0:.0f}s, loss {total:.2f}")
