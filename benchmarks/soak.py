"""Operational soak: hours of the full stage-2 GCC run on the real chip.

Drives the REAL CLI (gcc_tpu.cli.train) — prune-on-startup from a seeded
sparse checkpoint, the full cooperative step at pix2pix-cityscapes shapes
on synthetic data, epoch-end eval + best-checkpoint + full-state save —
then KILLS the process mid-run (SIGKILL, no cleanup) and resumes it with
--continue_train, exactly the crash/recovery path a production run needs
(VERDICT r2 #6). While running, samples the child's host RSS; afterwards,
computes step-time drift from the run's metrics.jsonl timestamps.

Outputs benchmarks/soak_result.json:
  phases (pre-kill / post-resume), epochs completed, imgs/sec over time
  (first vs last quartile => drift), peak/final RSS, resume integrity
  (epoch continuity from train_state.json + logger lines).

Run: python benchmarks/soak.py [--minutes 180] [--kill_after 0.5]
     [--batch 128] [--epoch_images 12800]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def make_seed_checkpoint(path: str, ngf: int = 32, num_downs: int = 8,
                         size: int = 256) -> None:
    """A synthetic 'sparsity-pretrained' checkpoint for prune-on-startup:
    spread per-channel scales/norms so the threshold search has structure
    (the same construction bench.py uses)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gcc_tpu.models.generators import UnetGenerator
    from gcc_tpu.utils.checkpoint import save_checkpoint

    rng_np = np.random.RandomState(0)
    g = UnetGenerator(ngf=ngf, num_downs=num_downs)
    # jit the init: eager init dispatches hundreds of ops over the axon
    # tunnel one by one (minutes); compiled it is one round trip
    v = jax.jit(lambda k1, k2: g.init(
        {"params": k1, "dropout": k2},
        jnp.zeros((1, size, size, 3))))(jax.random.PRNGKey(0),
                                        jax.random.PRNGKey(1))
    v = jax.device_get(v)
    params = jax.tree_util.tree_map(
        lambda s: (rng_np.rand(*np.shape(s)).astype(np.float32)
                   * np.exp(rng_np.uniform(-6, 2, np.shape(s)[-1])
                            ).astype(np.float32))
        if np.ndim(s) > 0 else np.asarray(s), v["params"])
    save_checkpoint(path, {
        "G": {"params": params, "batch_stats": v.get("batch_stats", {})},
        "epoch": 10, "cfg": (None, None), "fid": None})


FULL_SHAPES = {"crop": 256, "downs": 8, "ngf": 32, "ndf": 128,
               "tngf": 64, "tndf": 128, "budget": "3.0", "ntest": 32}
SMOKE_SHAPES = {"crop": 32, "downs": 5, "ngf": 4, "ndf": 4,
                "tngf": 8, "tndf": 8, "budget": None, "ntest": 4}


def train_cmd(name: str, batch: int, epoch_images: int, total_epochs: int,
              seed_ckpt: str, resume: bool, shapes=FULL_SHAPES) -> list:
    cmd = [sys.executable, "-m", "gcc_tpu.cli.train",
           "--dataroot", "synthetic", "--dataset_mode", "synthetic",
           "--model", "pix2pix", "--name", name,
           "--batch_size", str(batch),
           "--crop_size", str(shapes["crop"]),
           "--load_size", str(shapes["crop"]),
           "--num_downs", str(shapes["downs"]),
           "--ngf", str(shapes["ngf"]), "--ndf", str(shapes["ndf"]),
           "--teacher_ngf", str(shapes["tngf"]),
           "--teacher_ndf", str(shapes["tndf"]),
           "--online_distillation", "--darts_discriminator",
           "--lambda_L1", "100", "--lambda_content", "50",
           "--lambda_gram", "10000", "--gan_mode", "hinge",
           "--max_dataset_size", str(epoch_images),
           "--n_epochs", str(total_epochs), "--n_epochs_decay", "0",
           "--save_epoch_freq", "1", "--print_freq", str(batch * 4),
           "--ntest", str(shapes["ntest"]), "--num_threads", "4"]
    if shapes["budget"]:
        cmd += ["--scale_prune", "--target_budget", shapes["budget"],
                "--pretrain_path", seed_ckpt]
    if resume:
        cmd.append("--continue_train")
    return cmd


def run_phase(cmd, run_dir, seconds, kill_hard):
    """Run the trainer for up to `seconds`; if kill_hard, SIGKILL at the
    deadline (crash simulation), else SIGINT+wait. Samples RSS."""
    proc = subprocess.Popen(cmd, cwd=_REPO,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)
    rss = []
    t0 = time.time()
    status = "completed"
    while True:
        ret = proc.poll()
        if ret is not None:
            status = f"exited rc={ret}"
            break
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        rss.append(int(line.split()[1]) // 1024)
        except OSError:
            pass
        if time.time() - t0 > seconds:
            if kill_hard:
                proc.send_signal(signal.SIGKILL)  # crash: no cleanup at all
                status = "SIGKILL (simulated crash)"
            else:
                proc.terminate()
                status = "terminated at deadline"
            proc.wait()
            break
        time.sleep(20)
    return {"status": status, "wall_sec": round(time.time() - t0, 1),
            "rss_mb_peak": max(rss) if rss else None,
            "rss_mb_first": rss[0] if rss else None,
            "rss_mb_last": rss[-1] if rss else None,
            "rss_samples": len(rss)}


def analyze_metrics(run_dir, batch):
    """Step-time drift from metrics.jsonl timestamps (ts per print_freq)."""
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = []
    try:
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    pass
    except OSError:
        return {"error": "no metrics.jsonl"}
    rows = [r for r in rows if "iters" in r and "ts" in r]
    if len(rows) < 8:
        return {"records": len(rows), "note": "too few for drift"}
    # imgs/sec between consecutive records within the same process run
    # (iters reset on resume; ts gaps at eval/restart are excluded by
    # requiring monotonically increasing iters)
    rates = []
    for a, b in zip(rows, rows[1:]):
        di, dt = b["iters"] - a["iters"], b["ts"] - a["ts"]
        if di > 0 and 0 < dt < 600:
            rates.append((a["ts"], di / dt))
    if len(rates) < 8:
        return {"records": len(rows), "note": "too few rate samples"}
    q = max(1, len(rates) // 4)
    first = sorted(r for _, r in rates[:q])[q // 2]
    last = sorted(r for _, r in rates[-q:])[q // 2]
    return {"records": len(rows), "rate_samples": len(rates),
            "imgs_per_sec_first_quartile_median": round(first, 1),
            "imgs_per_sec_last_quartile_median": round(last, 1),
            "drift_pct": round(100.0 * (last - first) / first, 2)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=180)
    p.add_argument("--kill_after", type=float, default=0.5,
                   help="fraction of the budget before the simulated crash")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--epoch_images", type=int, default=12800)
    p.add_argument("--name", default="soak_r3")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU shapes: validates the harness logic only")
    args = p.parse_args()
    shapes = SMOKE_SHAPES if args.smoke else FULL_SHAPES
    if args.smoke:
        args.batch = min(args.batch, 2)
        args.epoch_images = min(args.epoch_images, 8)

    run_dir = os.path.join(_REPO, "experiments", args.name)
    os.makedirs(run_dir, exist_ok=True)
    seed_ckpt = os.path.join(run_dir, "seed_sparse.ckpt")
    if shapes["budget"] and not os.path.exists(seed_ckpt):
        make_seed_checkpoint(seed_ckpt)

    total_budget = args.minutes * 60
    # epochs sized so the budget is never the limiting factor
    total_epochs = max(4, int(total_budget / 30))
    cmd = train_cmd(args.name, args.batch, args.epoch_images, total_epochs,
                    seed_ckpt, resume=False, shapes=shapes)

    result = {"config": {"batch": args.batch,
                         "epoch_images": args.epoch_images,
                         "minutes": args.minutes,
                         "kill_after_frac": args.kill_after}}
    print("phase 1: train until simulated crash", flush=True)
    result["phase1"] = run_phase(cmd, run_dir,
                                 total_budget * args.kill_after,
                                 kill_hard=True)
    print(json.dumps(result["phase1"]), flush=True)

    meta_path = os.path.join(run_dir, "checkpoints", "train_state.json")
    epoch_at_kill = None
    try:
        with open(meta_path) as f:
            epoch_at_kill = json.load(f).get("epoch")
    except OSError:
        pass
    result["epoch_completed_at_kill"] = epoch_at_kill

    print("phase 2: --continue_train resume", flush=True)
    cmd2 = train_cmd(args.name, args.batch, args.epoch_images, total_epochs,
                     seed_ckpt, resume=True, shapes=shapes)
    result["phase2"] = run_phase(cmd2, run_dir,
                                 total_budget * (1 - args.kill_after),
                                 kill_hard=False)
    print(json.dumps(result["phase2"]), flush=True)

    try:
        with open(meta_path) as f:
            result["epoch_completed_final"] = json.load(f).get("epoch")
    except OSError:
        result["epoch_completed_final"] = None
    result["resumed_past_kill_epoch"] = (
        epoch_at_kill is not None
        and result["epoch_completed_final"] is not None
        and result["epoch_completed_final"] > epoch_at_kill)
    result["throughput"] = analyze_metrics(run_dir, args.batch)
    result["ts"] = time.time()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "soak_smoke_result.json" if args.smoke
                       else "soak_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
