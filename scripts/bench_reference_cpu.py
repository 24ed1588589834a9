"""Reference-vs-ours CPU head-to-head on the mapping stage (BASELINE.md task 2).

The reference's superquadric optimization is its CPU hot loop (SURVEY.md
SS3.4: a serial per-object Python loop, 200 Adam iterations each, crossing
Python->C++->autograd per iteration — /root/reference/src/scripts/
run_multi_view.py:44-65, sq_libs.py:432-475).  This script times the ACTUAL
reference optimizer (imported from /root/reference, its compiled Cython
sampler replaced by the same stub tests/test_optimizer_parity.py uses, fed
by OUR deterministic angle sampler so both sides do identical math) against
our batched lax.scan Adam solver and the LM fast path, on the same host CPU
and the same synthetic multi-object scene.

Apples-to-apples: same n_iters, same sample counts, same constraints, both
on one CPU core.  Our TPU numbers for the same stage live in BENCHMARKS.md.

Usage:
    JAX_PLATFORMS=cpu python scripts/bench_reference_cpu.py \
        [--objects 8] [--ref_objects 4] [--iters 200] [--samples 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

REF = "/root/reference"


def _install_ref_stubs():
    """Stub torchvision + the compiled sampler (same approach as
    tests/test_optimizer_parity.py — angles come from OUR sampler, so the
    reference exercises its real autograd/optimizer path on identical
    surface samples)."""
    import torch

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    for name, mod in [("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.boxes", tv_boxes)]:
        sys.modules.setdefault(name, mod)

    import jax.numpy as jnp

    from odam_tpu.ops import sampler as our_sampler

    lp = types.ModuleType("learnable_primitives")
    lp_s = types.ModuleType("learnable_primitives.sampling")

    class EqualDistanceSamplerSQ:
        def __init__(self, n_samples, *a, **k):
            self.n_samples = n_samples

    def sample_points_on_surface(shape_params, epsilons, sq_sampler):
        etas_j, omegas_j = our_sampler.sample_sq_angles(
            jnp.asarray(shape_params.detach().numpy()),
            jnp.asarray(epsilons.detach().numpy()),
            n_samples=sq_sampler.n_samples,
        )
        etas = torch.tensor(np.asarray(etas_j))
        omegas = torch.tensor(np.asarray(omegas_j))
        etas[etas == 0] += 1e-6
        omegas[omegas == 0] += 1e-6

        def fexp(x, p):
            return torch.sign(x) * torch.abs(x).clamp(min=1e-6) ** p

        a1 = shape_params[:, :, 0].unsqueeze(-1)
        a2 = shape_params[:, :, 1].unsqueeze(-1)
        a3 = shape_params[:, :, 2].unsqueeze(-1)
        e1 = epsilons[:, :, 0].unsqueeze(-1)
        e2 = epsilons[:, :, 1].unsqueeze(-1)
        x = a1 * fexp(torch.cos(etas), e1) * fexp(torch.cos(omegas), e2)
        y = a2 * fexp(torch.cos(etas), e1) * fexp(torch.sin(omegas), e2)
        z = a3 * fexp(torch.sin(etas), e1)
        clamp = lambda v: ((v > 0).float() * 2 - 1) * torch.max(  # noqa: E731
            torch.abs(v), torch.tensor(1e-6)
        )
        return torch.stack([clamp(x), clamp(y), clamp(z)], -1), None

    lp_s.EqualDistanceSamplerSQ = EqualDistanceSamplerSQ
    lp_s.sample_points_on_surface = sample_points_on_surface
    lp.sampling = lp_s
    sys.modules["learnable_primitives"] = lp
    sys.modules["learnable_primitives.sampling"] = lp_s


def _scene(rng, n_objects, n_views):
    """Synthetic multi-object scene: GT boxes + camera ring + noisy 2D boxes."""
    import jax.numpy as jnp

    from odam_tpu.utils import geometry as geo

    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    objs = []
    for i in range(n_objects):
        center = rng.uniform(-1.5, 1.5, 3) * np.array([1, 1, 0.2]) + [0, 0, 0.6]
        dims = rng.uniform(0.4, 1.2, 3)
        yaw = float(rng.uniform(0, np.pi))
        corners = np.asarray(geo.box3d_corners(
            jnp.asarray(dims), jnp.asarray(yaw), jnp.asarray(center)))
        Ps, boxes = [], []
        for k in range(n_views):
            phi = 2 * np.pi * k / n_views
            cam = center + 3.0 * np.array([np.cos(phi), np.sin(phi), 0.4])
            fwd = center - cam
            fwd /= np.linalg.norm(fwd)
            right = np.cross(fwd, [0, 0, 1.0])
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            T_wc = np.eye(4)
            T_wc[:3, 0], T_wc[:3, 1] = right, down
            T_wc[:3, 2], T_wc[:3, 3] = fwd, cam
            P = K @ np.linalg.inv(T_wc)[:3, :]
            hom = np.concatenate([corners, np.ones((8, 1))], 1)
            uv = hom @ P.T
            uv = uv[:, :2] / uv[:, 2:]
            box = np.array([uv[:, 0].min(), uv[:, 1].min(),
                            uv[:, 0].max(), uv[:, 1].max()])
            box += rng.normal(0, 1.0, 4)
            Ps.append(P)
            boxes.append(box)
        init_t = center + rng.normal(0, 0.15, 3)
        init_dims = dims * rng.uniform(1.1, 1.4)
        objs.append((np.asarray(Ps), np.asarray(boxes), init_t, init_dims, yaw))
    return objs


def _install_assoc_stubs():
    """torchvision stubs for importing the reference associator (same as
    tests/test_model_parity.py)."""
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15"
    tv_models = types.ModuleType("torchvision.models")
    tv_models_utils = types.ModuleType("torchvision.models._utils")
    tv_models_utils.IntermediateLayerGetter = object
    tv_models._utils = tv_models_utils
    tv.models = tv_models
    for name, mod in [("torchvision", tv), ("torchvision.models", tv_models),
                      ("torchvision.models._utils", tv_models_utils)]:
        sys.modules.setdefault(name, mod)


def bench_association(iters: int = 10):
    """Reference Associator.forward (torch CPU, production config) vs ours
    (jitted JAX, same host) at pipeline geometry: 48 tracks x window 100,
    30 detections.  The reference runs this per frame on its GPU; on this
    shared-nothing CPU host the head-to-head isolates program structure
    (per-layer Python dispatch vs one fused XLA program)."""
    import time

    import torch

    import jax.numpy as jnp

    from odam_tpu.models.associator import Associator, AssociatorConfig

    _install_assoc_stubs()
    # remap .to("cuda") -> .to("cpu"): the reference associator hardcodes
    # cuda placement (associator.py:320); same trick as test_model_parity
    orig_to = torch.Tensor.to

    def _to(self, *a, **k):
        a = tuple("cpu" if (isinstance(x, (str, torch.device))
                            and str(x) == "cuda") else x for x in a)
        if str(k.get("device", "")) == "cuda":
            k["device"] = "cpu"
        return orig_to(self, *a, **k)

    torch.Tensor.to = _to
    sys.path.insert(0, REF)
    import importlib

    ref_mod = importlib.import_module("src.models.associator")

    torch.manual_seed(0)
    config = {
        "descriptor_dim": 256, "weights": "indoor",
        "keypoint_encoder": [78, 256, 256],
        "GNN_layers": ["self", "cross"] * 4,
        "self_GNN_layers": ["self", "self"],
        "match_threshold": 0.2, "sinkhorn_iterations": 100,
    }
    ref = ref_mod.Associator(config).eval()

    rng = np.random.default_rng(0)
    T, W, NV, MAXD = 48, 100, 25, 30
    tracks_np = np.full((T, 79, W), -1.0, dtype=np.float32)
    for t in range(T):
        n = int(rng.integers(40, W))
        tracks_np[t, 0, :n] = np.sort(rng.integers(0, 500, size=n))
        tracks_np[t, 1:, :n] = rng.normal(size=(78, n)) * 0.5
    dets_np = np.full((1, 79, MAXD), -1.0, dtype=np.float32)
    dets_np[0, 0, :NV] = 500.0
    dets_np[0, 1:, :NV] = rng.normal(size=(78, NV)) * 0.5
    in_data = {"detections": torch.from_numpy(dets_np),
               "tracks": torch.from_numpy(tracks_np),
               "valid_list": [(T, NV)]}
    with torch.no_grad():
        ref(in_data, 0.1, eval_only=True, device="cpu")  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            ref(in_data, 0.1, eval_only=True, device="cpu")
    ref_ms = (time.perf_counter() - t0) / iters * 1e3

    import jax

    ours = Associator(AssociatorConfig())
    params = ours.init(
        jax.random.key(0),
        jnp.asarray(tracks_np.transpose(0, 2, 1))[None], jnp.ones((1, T), bool),
        jnp.asarray(dets_np.transpose(0, 2, 1)), jnp.arange(MAXD)[None] < NV,
        0.1,
    )
    fwd = jax.jit(lambda p, tr, tv_, de, dv: ours.apply(p, tr, tv_, de, dv, 0.1))
    a = (jnp.asarray(tracks_np.transpose(0, 2, 1))[None], jnp.ones((1, T), bool),
         jnp.asarray(dets_np.transpose(0, 2, 1)), jnp.arange(MAXD)[None] < NV)
    float(jnp.sum(fwd(params, *a).log_assignment))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, *a)
    float(jnp.sum(out.log_assignment))
    ours_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"association fwd (48trk x w100, 30 dets, Sinkhorn-100): "
          f"reference torch-CPU {ref_ms:.0f} ms | ours jit-CPU {ours_ms:.0f} ms"
          f" | ours TPU (BENCHMARKS.md): 3.0 ms")
    return ref_ms, ours_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=8,
                    help="objects in the batched (ours) solve")
    ap.add_argument("--ref_objects", type=int, default=4,
                    help="objects actually run through the reference's serial "
                         "loop (its cost is linear in objects; extrapolated)")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--views", type=int, default=24)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from odam_tpu.mapping import lm_solver, optimizer as our_opt, superquadric as sq

    rng = np.random.default_rng(0)
    objs = _scene(rng, args.objects, args.views)

    # ---- reference: serial per-object Adam (run_multi_view.py:44-65)
    _install_ref_stubs()
    sys.path.insert(0, REF)
    cwd = os.getcwd()
    os.chdir(REF)  # sq_libs loads ./src/super_quadric/scale_prior relatively
    try:
        import importlib

        ref_sq = importlib.import_module("src.super_quadric.sq_libs")
    finally:
        os.chdir(cwd)

    os.chdir(REF)  # SuperQuadricOptimizer opens ./src/super_quadric/scale_prior
    try:
        t0 = time.perf_counter()
        for Ps, boxes, init_t, init_dims, yaw in objs[: args.ref_objects]:
            opt = ref_sq.SuperQuadricOptimizer(
                init_t.copy(), yaw, init_dims.copy(), obj_class=5,
                representation="super_quadric", prior=False,
            )
            opt.Q_init.sampler.n_samples = args.samples
            gt_lines = [
                {"x_min": np.array([1, 0, -b[0]]),
                 "y_min": np.array([0, 1, -b[1]]),
                 "x_max": np.array([1, 0, -b[2]]),
                 "y_max": np.array([0, 1, -b[3]])}
                for b in boxes
            ]
            opt.run(gt_lines, None, Ps.astype(np.float32), n_iters=args.iters)
        ref_dt = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    ref_scene = ref_dt / args.ref_objects * args.objects
    print(f"reference serial Adam ({args.ref_objects} objs measured): "
          f"{ref_dt:.1f}s -> {ref_scene:.1f}s / {args.objects}-object scene")

    # ---- ours: batched Adam (one lax.scan over the whole scene)
    def batch():
        t = jnp.asarray(np.stack([o[2] for o in objs]).astype(np.float32))
        yaws = jnp.asarray(np.array([o[4] for o in objs], np.float32))
        d = jnp.asarray(np.stack([o[3] for o in objs]).astype(np.float32))
        boxes = jnp.asarray(np.stack([o[1] for o in objs]).astype(np.float32))
        Ps = jnp.asarray(np.stack([o[0] for o in objs]).astype(np.float32))
        init = sq.init_params(t, yaws, d)
        mask = jnp.ones((args.objects, args.views, 4), jnp.float32)
        valid = jnp.ones((args.objects, args.views), jnp.float32)
        active = jnp.ones((args.objects,), bool)
        return init, boxes, mask, valid, Ps, active

    init, boxes, mask, valid, Ps, active = batch()

    def run_adam():
        return our_opt.optimize_superquadrics(
            init, boxes, mask, valid, Ps, active, None,
            n_iters=args.iters, n_samples=args.samples, use_prior=False)

    res = run_adam()  # compile
    float(jnp.sum(res.params.translate))
    t0 = time.perf_counter()
    res = run_adam()
    float(jnp.sum(res.params.translate))
    ours_adam = time.perf_counter() - t0
    print(f"ours batched Adam ({args.objects} objs, one scan): {ours_adam:.2f}s")

    # ---- ours: LM fast path
    def run_lm():
        return lm_solver.optimize_superquadrics_lm(
            init, boxes, mask, valid, Ps, active, None,
            n_iters=30, n_samples=512, use_prior=False)

    res2 = run_lm()
    float(jnp.sum(res2.params.translate))
    t0 = time.perf_counter()
    res2 = run_lm()
    float(jnp.sum(res2.params.translate))
    ours_lm = time.perf_counter() - t0
    print(f"ours LM (30 it x 512 pts): {ours_lm:.2f}s")

    ref_assoc_ms, ours_assoc_ms = bench_association()

    print(json.dumps({
        "host": "single-core CPU",
        "scene": {"objects": args.objects, "views": args.views,
                  "iters": args.iters, "samples": args.samples},
        "reference_scene_s": round(ref_scene, 2),
        "ours_adam_scene_s": round(ours_adam, 2),
        "ours_lm_scene_s": round(ours_lm, 2),
        "speedup_adam": round(ref_scene / ours_adam, 1),
        "speedup_lm": round(ref_scene / ours_lm, 1),
        "assoc_ref_cpu_ms": round(ref_assoc_ms, 1),
        "assoc_ours_cpu_ms": round(ours_assoc_ms, 1),
    }))


if __name__ == "__main__":
    main()
