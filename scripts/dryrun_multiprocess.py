"""Execute the distributed layer with REAL processes.

The reference's only genuine distributed capability is multi-process NCCL
data parallelism (src/utils/misc.py:90-130, 390-412: env-var rank discovery,
pickle all_gather, reduce_dict).  The TPU-native twin
(odam_tpu/parallel/distributed.py) had only ever run single-process — every
collective exercised its ``process_count()==1`` no-op branch (VERDICT r3).
This rig runs the real thing: 2 OS processes x 4 virtual CPU devices each,
one 8-device global mesh, ``jax.distributed`` with a local coordinator.

Per process it executes
  - a mesh-sharded DETR train step whose global batch is assembled from
    per-process local shards (``mesh.shard_local_batch``): the gradient
    all-reduce crosses the process boundary;
  - ``all_gather_arrays`` / ``reduce_scalars`` with process-dependent
    values, asserting the (2, ...) gather and the cross-process mean —
    the fixed-schema replacements for misc.py:90-157.

Run:  python scripts/dryrun_multiprocess.py  [n_processes] [devices_per_proc]
Also wired into the tail of ``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys


def child_main() -> None:
    pid = int(os.environ["ODAM_MP_PID"])
    nproc = int(os.environ["ODAM_MP_NPROCS"])
    coord = os.environ["ODAM_MP_COORD"]
    n_local = int(os.environ["ODAM_MP_LOCAL_DEVICES"])

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from odam_tpu.parallel import distributed as dist_mod
    from odam_tpu.parallel import mesh as mesh_mod

    # explicit-argument form: failures propagate (a silent single-process
    # fallback would no-op every collective while looking green)
    dist_mod.init_distributed(coord, nproc, pid)
    assert dist_mod.process_count() == nproc, dist_mod.process_count()
    assert dist_mod.process_index() == pid
    assert dist_mod.local_device_count() == n_local
    n_devices = nproc * n_local
    assert len(jax.devices()) == n_devices, len(jax.devices())

    import jax.numpy as jnp

    from odam_tpu.models import criterion as crit_mod
    from odam_tpu.models import detr as detr_mod
    from odam_tpu.models import training as train_mod

    # ---- cross-process collectives (misc.py:90-157 equivalents) ----
    g = dist_mod.all_gather_arrays(np.arange(3.0) + 10.0 * pid)
    assert g.shape == (nproc, 3), g.shape
    for p in range(nproc):
        np.testing.assert_allclose(g[p], np.arange(3.0) + 10.0 * p)

    r = dist_mod.reduce_scalars({"loss": float(pid), "n": 4.0})
    # mean over pids 0..nproc-1
    assert abs(r["loss"] - (nproc - 1) / 2.0) < 1e-9, r
    assert r["n"] == 4.0, r
    r_sum = dist_mod.reduce_scalars({"boxes": 3.0}, average=False)
    assert r_sum["boxes"] == 3.0 * nproc, r_sum

    # ---- dp train step over the global mesh ----
    mesh = mesh_mod.make_mesh({"dp": n_devices})
    cfg = detr_mod.DETRConfig(
        num_classes=8, num_queries=8, hidden_dim=32, nheads=4,
        enc_layers=1, dec_layers=2, dim_feedforward=64, aux_loss=True,
    )
    model = detr_mod.DETR(cfg)
    B_local, M = n_local, 4  # global batch = nproc * n_local
    params = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    # identical on every process (same seed); hand jit uncommitted host
    # copies so the replicated in_sharding owns placement
    params = jax.tree.map(np.asarray, params)
    tcfg = train_mod.DetrTrainConfig(
        criterion=crit_mod.CriterionConfig(num_classes=cfg.num_classes)
    )
    tx = train_mod.make_detr_optimizer(params, tcfg)
    state = train_mod.init_train_state(params, tx)
    state = jax.tree.map(np.asarray, state)
    step = train_mod.make_detr_train_step(model, tx, tcfg, mesh)

    rng = np.random.default_rng(100 + pid)  # process-local data shard
    local_images = rng.normal(0, 1, (B_local, 64, 64, 3)).astype(np.float32)
    local_targets = crit_mod.Targets(
        classes=rng.integers(0, cfg.num_classes, (B_local, M)).astype(np.int32),
        boxes=rng.uniform(0.3, 0.6, (B_local, M, 4)).astype(np.float32),
        sizes=np.ones((B_local, M, 3), np.float32),
        offsets=np.zeros((B_local, M, 2), np.float32),
        depths=np.ones((B_local, M), np.float32),
        angle_bins=np.zeros((B_local, M), np.int32),
        mask=np.ones((B_local, M), bool),
    )
    images = mesh_mod.shard_local_batch(local_images, mesh)
    targets = crit_mod.Targets(*mesh_mod.shard_local_batch(
        tuple(local_targets), mesh))
    assert images.shape == (nproc * B_local, 64, 64, 3), images.shape

    state2, metrics = step(state, images, targets, jax.random.key(1))
    total = float(metrics["total"])  # replicated output: addressable everywhere
    assert np.isfinite(total), total
    # the update must actually change the (replicated) params on this host
    delta = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params, state2.params)
    assert max(jax.tree.leaves(delta)) > 0.0

    # gathering the per-process loss shows every rank saw the same global
    # loss (one global program, not nproc disconnected ones)
    totals = dist_mod.all_gather_arrays(np.asarray(total))
    assert np.allclose(totals, total), totals

    print(f"proc {pid}/{nproc}: devices={n_devices} global_loss={total:.4f} "
          f"gather={g.shape} reduced_loss={r['loss']:.2f} OK", flush=True)


def parent_main(nproc: int = 2, n_local: int = 4, timeout: int = 900) -> None:
    # choose a coordinator port (bind-and-release: fine for a local rig)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env_base = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    for pid in range(nproc):
        env = dict(
            env_base,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local}",
            ODAM_MP_PID=str(pid),
            ODAM_MP_NPROCS=str(nproc),
            ODAM_MP_COORD=f"127.0.0.1:{port}",
            ODAM_MP_LOCAL_DEVICES=str(n_local),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        sys.stderr.write(out)
        if p.returncode != 0:
            ok = False
    if not ok:
        raise SystemExit("dryrun_multiprocess FAILED")
    print(f"dryrun_multiprocess OK: {nproc} processes x {n_local} devices, "
          "cross-process gradient all-reduce + all_gather/reduce verified")


if __name__ == "__main__":
    if "ODAM_MP_PID" in os.environ:
        child_main()
    else:
        parent_main(
            nproc=int(sys.argv[1]) if len(sys.argv) > 1 else 2,
            n_local=int(sys.argv[2]) if len(sys.argv) > 2 else 4,
        )
