"""Crash-recovery demonstration: training survives a mid-save kill / worker fault.

The design exists because this environment's TPU worker kernel-faults under
sustained fwd+bwd load (CLAUDE.md); the mitigation is crash-safe banked
checkpoints (utils/checkpoint.save: rename-atomic with .bak fallback and an
orbax commit-marker check in latest_path).  This script PROVES the recovery
path end to end:

1. run a training burst as a subprocess (examples/cli_rehearsal/train.py),
   banking every --bank steps;
2. kill it — either deliberately (SIGKILL the moment the checkpoint's .tmp
   directory appears, i.e. mid-save: the worst-case window) or by waiting
   for a natural worker fault;
3. a fresh process restores from the banked checkpoint and finishes the
   remaining steps;
4. a separate uninterrupted run of the same total length provides the
   baseline: final losses must agree within --tol.

Usage (TPU or CPU):
    python scripts/crash_recovery_demo.py --mode detector_frozen \
        --steps 2000 --bank 400 [--kill mid_save|none]

Writes a JSON line with the measured outcome.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_segment(mode, seg, steps, ckpt, bank, env_extra, capture):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{REPO}/examples/cli_rehearsal:" + env.get(
        "PYTHONPATH", "")
    env["ODAM_BANK"] = str(bank)
    env.update(env_extra)
    cmd = [sys.executable, os.path.join(REPO, "examples/cli_rehearsal/train.py"),
           mode, str(seg), str(steps), ckpt]
    return subprocess.Popen(
        cmd, env=env, cwd=REPO,
        stdout=capture, stderr=subprocess.STDOUT,
    )


def final_loss(log_path):
    with open(log_path) as f:
        text = f.read()
    losses = re.findall(r"loss ([0-9.]+)", text)
    return float(losses[-1]) if losses else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="detector_frozen",
                    choices=["detector", "detector_frozen"],
                    help="detector = full fwd+bwd (the TPU-faulting load); "
                         "detector_frozen = CPU-feasible head training")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--bank", type=int, default=400)
    ap.add_argument("--kill", default="mid_save",
                    choices=["mid_save", "none"],
                    help="mid_save: SIGKILL when the .tmp checkpoint dir "
                         "appears (worst case); none: wait for a natural "
                         "worker fault or completion")
    ap.add_argument("--tol", type=float, default=0.15,
                    help="relative tolerance on final loss vs uninterrupted")
    ap.add_argument("--workdir", default="/tmp/crash_recovery_demo")
    args = ap.parse_args()

    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir)
    env_extra = {"ODAM_DECAY_STEPS": str(args.steps)}

    # ---- baseline: uninterrupted run
    base_ckpt = os.path.join(args.workdir, "baseline_ckpt")
    base_log = os.path.join(args.workdir, "baseline.log")
    t0 = time.time()
    with open(base_log, "w") as f:
        p = run_segment(args.mode, 0, args.steps, base_ckpt, args.bank,
                        env_extra, f)
        p.wait()
    assert p.returncode == 0, f"baseline failed; see {base_log}"
    base_time = time.time() - t0
    base_final = final_loss(base_log)
    print(f"baseline: {args.steps} steps in {base_time:.0f}s, "
          f"final loss {base_final}")

    # ---- interrupted run
    ckpt = os.path.join(args.workdir, "crash_ckpt")
    log1 = os.path.join(args.workdir, "crash_seg0.log")
    tmp_dir = ckpt + ".tmp"
    with open(log1, "w") as f:
        p = run_segment(args.mode, 0, args.steps, ckpt, args.bank,
                        env_extra, f)
        killed = None
        saves_seen = 0
        # orbax stages the write under <ckpt>.tmp.orbax-checkpoint-tmp-<ts>
        # and renames to <ckpt>.tmp only at commit, so the committed .tmp
        # exists for microseconds; the staging dir spans the whole write and
        # is the observable mid-save window.
        in_save = lambda: bool(glob.glob(tmp_dir + "*"))  # noqa: E731
        while p.poll() is None:
            if args.kill == "mid_save" and in_save():
                saves_seen += 1
                if saves_seen >= 2:  # let the first bank commit, kill the 2nd
                    os.kill(p.pid, signal.SIGKILL)
                    killed = "SIGKILL mid-save (orbax staging dir present)"
                    break
                while in_save() and p.poll() is None:
                    time.sleep(0.02)  # wait out the first save
            time.sleep(0.02)
        p.wait()
    if killed is None:
        killed = (f"natural exit rc={p.returncode}"
                  if p.returncode else "completed uninterrupted")
    print(f"interruption: {killed}")

    # ---- recovery: fresh process restores the banked state and continues
    from odam_tpu.utils import checkpoint

    t0 = time.time()
    latest = checkpoint.latest_path(ckpt)
    assert latest is not None, "no intact checkpoint survived the kill"
    print(f"intact checkpoint after kill: {latest}")
    # steps already banked: parse "banked at step N" lines
    with open(log1) as f:
        banked = re.findall(r"banked at step (\d+)", f.read())
    done = int(banked[-1]) if banked else 0
    remaining = max(args.steps - done, 1)
    log2 = os.path.join(args.workdir, "crash_seg1.log")
    with open(log2, "w") as f:
        p = run_segment(args.mode, 1, remaining, ckpt, args.bank,
                        env_extra, f)
        p.wait()
    assert p.returncode == 0, f"recovery segment failed; see {log2}"
    rec_time = time.time() - t0
    with open(log2) as f:
        assert "resumed from" in f.read(), "recovery did not restore"
    rec_final = final_loss(log2)
    print(f"recovery: restored + {remaining} steps in {rec_time:.0f}s, "
          f"final loss {rec_final}")

    rel = abs(rec_final - base_final) / max(abs(base_final), 1e-6)
    result = {
        "mode": args.mode,
        "steps": args.steps,
        "interruption": killed,
        "banked_steps_at_kill": done,
        "baseline_final_loss": base_final,
        "recovered_final_loss": rec_final,
        "relative_diff": rel,
        "within_tolerance": rel <= args.tol,
    }
    print(json.dumps(result))
    assert rel <= args.tol, (
        f"resume-after-fault diverged from uninterrupted training: {result}")


if __name__ == "__main__":
    main()
