"""Headless superquadric-fitting demo.

TPU-native twin of the reference's interactive Pangolin demo
(/root/reference/src/super_quadric/learnable_primitives/main.py:18-117):
fit a superquadric (position + axis scales + two shape exponents) to the
sampled surface of a ground-truth superquadric by pointwise L1 on
corresponding surface samples — the reference's exact objective
(main.py:89-99: size squared for positivity, shape squashed to [0.2, 1.6]).
The reference runs Adam lr 0.001 x 1000 iterations, which does not converge
from its far init; the defaults here (lr 0.005 x 2000) reach pointwise L1
~1e-3 — pass --lr 0.001 --iters 1000 for the reference schedule.
Instead of a Pangolin window it writes headless artifacts:

- ``gt.obj`` / ``fitted.obj`` — surface meshes of the ground-truth and the
  fitted superquadric (utils.visualization.sq_surface_mesh);
- ``convergence.png`` — a strip of point-cloud snapshots at iteration
  checkpoints plus the loss curve.

The whole optimization loop is one ``lax.scan`` (one compiled program),
not a Python loop — the shape the mapping optimizer uses for real scenes.

Run: ``python examples/fit_superquadric.py [--out_dir OUT] [--iters N]``.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from odam_tpu.ops import sampler, surface

N_SAMPLES = 1000
CHECKPOINTS = 6  # snapshots in the convergence strip


def sample_sq(pos, scales, epsilons, n_samples=N_SAMPLES):
    """Surface samples of one superquadric: [S, 3]."""
    pts, _ = sampler.sample_surface_points(
        scales[None], epsilons[None], n_samples
    )
    return pts[0] + pos[None]


def fit(gt_pos, gt_scales, gt_epsilons, n_iters: int = 2000,
        lr: float = 5e-3):
    """Fit init (unit sphere at origin) to the GT surface samples.

    Returns (param trajectory at checkpoints, loss log [n_iters], final
    params dict).  Parameterization matches the reference demo: size stored
    as sqrt (squared on use, main.py:86), shapes squashed by sigmoid to
    [0.2, 1.6] (main.py:87).
    """
    import optax

    gt_pts = sample_sq(jnp.asarray(gt_pos), jnp.asarray(gt_scales),
                       jnp.asarray(gt_epsilons))

    params = {
        "size_sqrt": jnp.ones((3,)),   # reference init_size = 1 (main.py:75)
        "shape_raw": jnp.zeros((2,)),  # squashes to eps = 0.9
        "pos": jnp.zeros((3,)),
    }
    tx = optax.adam(lr)

    def loss_fn(p):
        scales = p["size_sqrt"] ** 2
        eps = surface.squash_shape(p["shape_raw"])
        pts = sample_sq(p["pos"], scales, eps)
        return jnp.mean(jnp.abs(pts - gt_pts))

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), (loss, p)

        (params, _), (losses, traj) = jax.lax.scan(
            step, (params, opt_state), None, length=n_iters
        )
        return params, losses, traj

    params, losses, traj = run(params)
    idx = np.linspace(0, n_iters - 1, CHECKPOINTS).round().astype(int)
    checkpoints = [
        jax.tree.map(lambda x: np.asarray(x[i]), traj) for i in idx
    ]
    return np.asarray(gt_pts), checkpoints, np.asarray(losses), params, idx


def write_artifacts(out_dir: str, gt_pts, checkpoints, losses, params,
                    ckpt_iters, gt) -> dict:
    """Write gt.obj / fitted.obj / convergence.png; returns artifact paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from odam_tpu.mapping import superquadric as sq
    from odam_tpu.utils import visualization as viz

    os.makedirs(out_dir, exist_ok=True)
    gt_pos, gt_scales, gt_epsilons = gt

    def params_to_sq(pos, scales, epsilons):
        # SQParams stores scales as sqrt(dims/2) and raw (pre-squash)
        # shapes; invert the demo parameterization into that contract.
        eps = np.clip(np.asarray(epsilons), 0.2001, 1.5999)
        raw = np.log((eps - 0.2) / (1.6 - eps))  # inverse sigmoid squash
        return sq.SQParams(
            translate=jnp.asarray(np.asarray(pos), jnp.float32),
            angle=jnp.asarray(0.0, jnp.float32),
            scales=jnp.asarray(np.sqrt(np.asarray(scales)), jnp.float32),
            shapes=jnp.asarray(raw, jnp.float32),
        )

    paths = {}
    fitted_scales = np.asarray(params["size_sqrt"]) ** 2
    fitted_eps = np.asarray(surface.squash_shape(params["shape_raw"]))
    for name, (pos, scales, eps) in {
        "gt": (gt_pos, gt_scales, gt_epsilons),
        "fitted": (np.asarray(params["pos"]), fitted_scales, fitted_eps),
    }.items():
        verts, faces = viz.sq_surface_mesh(params_to_sq(pos, scales, eps))
        path = os.path.join(out_dir, f"{name}.obj")
        viz.export_obj(path, verts, faces)
        paths[name] = path

    fig, axes = plt.subplots(1, len(checkpoints) + 1,
                             figsize=(3 * (len(checkpoints) + 1), 3))
    for ax, p, it in zip(axes[:-1], checkpoints, ckpt_iters):
        scales = np.asarray(p["size_sqrt"]) ** 2
        eps = np.asarray(surface.squash_shape(jnp.asarray(p["shape_raw"])))
        pts = np.asarray(sample_sq(jnp.asarray(p["pos"]),
                                   jnp.asarray(scales), jnp.asarray(eps)))
        ax.scatter(gt_pts[:, 0], gt_pts[:, 2], s=2, c="tab:red", alpha=0.4,
                   label="GT")
        ax.scatter(pts[:, 0], pts[:, 2], s=2, c="tab:green", alpha=0.4,
                   label="fit")
        ax.set_title(f"iter {it}")
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
    axes[0].legend(loc="upper left", fontsize=7)
    axes[-1].plot(losses)
    axes[-1].set_yscale("log")
    axes[-1].set_title("L1 loss")
    strip = os.path.join(out_dir, "convergence.png")
    fig.tight_layout()
    fig.savefig(strip, dpi=110)
    plt.close(fig)
    paths["strip"] = strip
    return paths


def main(out_dir: str = "result/fit_superquadric", n_iters: int = 2000,
         seed: int = 0, lr: float = 5e-3, verbose: bool = True) -> dict:
    rng = np.random.default_rng(seed)
    gt_pos = rng.uniform(-2, 2, 3).astype(np.float32)
    gt_scales = rng.uniform(0.4, 2.0, 3).astype(np.float32)
    gt_epsilons = rng.uniform(0.3, 1.5, 2).astype(np.float32)

    gt_pts, checkpoints, losses, params, ckpt_iters = fit(
        gt_pos, gt_scales, gt_epsilons, n_iters, lr
    )
    paths = write_artifacts(
        out_dir, gt_pts, checkpoints, losses, params, ckpt_iters,
        (gt_pos, gt_scales, gt_epsilons),
    )
    result = {
        "loss_first": float(losses[0]),
        "loss_final": float(losses[-1]),
        "pos_err": float(np.linalg.norm(np.asarray(params["pos"]) - gt_pos)),
        "scale_err": float(np.max(np.abs(
            np.asarray(params["size_sqrt"]) ** 2 - gt_scales
        ))),
        "paths": paths,
    }
    if verbose:
        print(f"GT pos {gt_pos}, scales {gt_scales}, eps {gt_epsilons}")
        print(f"loss {result['loss_first']:.4f} -> {result['loss_final']:.4f}")
        print(f"pos err {result['pos_err']:.4f}, "
              f"max scale err {result['scale_err']:.4f}")
        print(f"artifacts: {paths}")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", default="result/fit_superquadric")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    main(args.out_dir, args.iters, args.seed, args.lr)
