"""The complete 3-stage GCC product path, end-to-end, on the real chip.

The reference's README workflow (README.md:38-62) is three commands:
  1. pretrain-for-pruning: train the full GAN with L1 sparsity on G's BN
     scales (scripts/pix2pix/pretrain_for_pruning.sh)
  2. GCC train: load the sparse ckpt, prune G to the MACs budget, train
     student+teacher cooperatively (scripts/pix2pix/train.sh)
  3. test: rebuild the pruned topology from the checkpoint's cfg and
     evaluate (scripts/pix2pix/test.sh)

tests/test_data_cli.py proves the chain on tiny CPU shapes;
benchmarks/soak.py proves hours of stage 2 from a SEEDED sparse ckpt.
This harness closes the remaining gap: all THREE stages chained at
reference pix2pix-cityscapes shapes (256^2, ngf 32 / ndf 128, teacher
64/128, 3.0 GMACs budget) on the real TPU, with the stage-2 prune search
consuming the ACTUAL stage-1 sparsity-trained checkpoint — the exact
artifact handoff a reference user performs.

Records per stage: wall time, exit code, epochs completed, the pruned
cfgs + achieved GMACs (stage 2), eval metrics and best checkpoints, and
whether the stage-3 rebuild-from-cfg loaded the stage-2 checkpoint and
dumped images. Writes benchmarks/workflow_demo_result.json.

Note on throughput: this 1-core sandbox host is loader-bound (~10 img/s,
benchmarks/e2e_bench.py) so epochs are sized in hundreds of images; the
demo evidences the PRODUCT PATH, not throughput (bench.py owns that).

Run: python benchmarks/workflow_demo.py [--epoch_images 1024]
     [--s1_epochs 12] [--s2_epochs 5] [--batch 64] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run_stage(name: str, cmd: list, log_path: str, timeout_s: float) -> dict:
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.time()
    with open(log_path, "w") as log:
        try:
            rc = subprocess.run(cmd, cwd=_REPO, stdout=log,
                                stderr=subprocess.STDOUT,
                                timeout=timeout_s).returncode
        except subprocess.TimeoutExpired:
            rc = -1
    out = {"cmd": " ".join(cmd), "rc": rc,
           "wall_sec": round(time.time() - t0, 1), "log": log_path}
    print(f"[{name}] rc={rc} in {out['wall_sec']}s", flush=True)
    return out


def grep_log(path: str, pattern: str, last: bool = True):
    hits = []
    try:
        with open(path) as f:
            for line in f:
                m = re.search(pattern, line)
                if m:
                    hits.append(m.group(1) if m.groups() else m.group(0))
    except OSError:
        return None
    if not hits:
        return None
    return hits[-1] if last else hits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epoch_images", type=int, default=1024)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--s1_epochs", type=int, default=12)
    p.add_argument("--s2_epochs", type=int, default=5)
    p.add_argument("--name", default="workflow_demo")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU shapes: validates harness logic only")
    args = p.parse_args()

    if args.smoke:
        shapes = {"crop": 32, "downs": 5, "ngf": 4, "ndf": 4, "tngf": 8,
                  "tndf": 8, "budget": "0.008"}
        args.epoch_images, args.batch = 8, 2
        args.s1_epochs, args.s2_epochs = 2, 2
    else:
        # reference pix2pix-cityscapes shapes (scripts/pix2pix/*.sh)
        shapes = {"crop": 256, "downs": 8, "ngf": 32, "ndf": 128,
                  "tngf": 64, "tndf": 128, "budget": "3.0"}

    s1_name = f"{args.name}_s1"
    s2_name = f"{args.name}_s2"
    s3_name = f"{args.name}_s3"
    exp = os.path.join(_REPO, "experiments")
    bench_dir = os.path.dirname(os.path.abspath(__file__))
    result = {"config": vars(args), "shapes": shapes}

    common = ["--dataroot", "synthetic", "--dataset_mode", "synthetic",
              "--model", "pix2pix",
              "--batch_size", str(args.batch),
              "--crop_size", str(shapes["crop"]),
              "--load_size", str(shapes["crop"]),
              "--num_downs", str(shapes["downs"]),
              "--ngf", str(shapes["ngf"]), "--ndf", str(shapes["ndf"]),
              "--max_dataset_size", str(args.epoch_images),
              "--save_epoch_freq", "2",
              "--print_freq", str(args.batch * 4),
              "--ntest", "16", "--num_threads", "4"]

    # ---- stage 1: sparsity pretraining (pretrain_for_pruning.sh) ----------
    s1 = [sys.executable, "-m", "gcc_tpu.cli.train", "--name", s1_name,
          "--lambda_scale", "1e-2", "--lambda_L1", "100",
          "--n_epochs", str(args.s1_epochs), "--n_epochs_decay", "0",
          *common]
    result["stage1"] = run_stage(
        "stage1", s1, os.path.join(bench_dir, "workflow_s1.log"),
        timeout_s=3 * 3600)
    s1_log = os.path.join(exp, s1_name, "logger.log")
    result["stage1"]["epochs_done"] = grep_log(
        s1_log, r"End of epoch (\d+)")
    best_ckpt = _best_ckpt(exp, s1_name)
    result["stage1"]["best_ckpt"] = best_ckpt
    if result["stage1"]["rc"] != 0 or not best_ckpt:
        _finish(result, bench_dir, args.smoke)
        return

    # ---- stage 2: prune from the stage-1 ckpt + GCC train (train.sh) ------
    s2 = [sys.executable, "-m", "gcc_tpu.cli.train", "--name", s2_name,
          "--darts_discriminator", "--arch_lr", "1e-4", "--arch_lr_step",
          "--scale_prune", "--target_budget", shapes["budget"],
          "--pretrain_path", best_ckpt,
          "--online_distillation", "--lambda_content", "50",
          "--lambda_gram", "1e4", "--lambda_L1", "100",
          "--teacher_ngf", str(shapes["tngf"]),
          "--teacher_ndf", str(shapes["tndf"]),
          "--n_epochs", str(args.s2_epochs), "--n_epochs_decay", "0",
          *common]
    result["stage2"] = run_stage(
        "stage2", s2, os.path.join(bench_dir, "workflow_s2.log"),
        timeout_s=4 * 3600)
    s2_log = os.path.join(exp, s2_name, "logger.log")
    result["stage2"]["epochs_done"] = grep_log(s2_log, r"End of epoch (\d+)")
    result["stage2"]["pruned_filter_cfgs"] = grep_log(
        s2_log, r"pruned filter_cfgs: (\[.*\])")
    result["stage2"]["pruned_gmacs"] = grep_log(
        s2_log, r"\(([\d.]+) GMACs\)")
    result["stage2"]["sparsity_lines"] = grep_log(
        s2_log, r"sparsity ratio: [\d.]+", last=False)
    s2_best = _best_ckpt(exp, s2_name)
    result["stage2"]["best_ckpt"] = s2_best
    if result["stage2"]["rc"] != 0 or not s2_best:
        _finish(result, bench_dir, args.smoke)
        return

    # ---- stage 3: rebuild-from-cfg + test (test.sh) -----------------------
    s3 = [sys.executable, "-m", "gcc_tpu.cli.test", "--name", s3_name,
          "--dataroot", "synthetic", "--dataset_mode", "synthetic",
          "--model", "pix2pix",
          "--crop_size", str(shapes["crop"]),
          "--load_size", str(shapes["crop"]),
          "--num_downs", str(shapes["downs"]),
          "--ngf", str(shapes["ngf"]),
          "--max_dataset_size", "32", "--ntest", "32",
          "--pretrain_path", s2_best]
    result["stage3"] = run_stage(
        "stage3", s3, os.path.join(bench_dir, "workflow_s3.log"),
        timeout_s=3600)
    img_dir = os.path.join(exp, s3_name)
    n_imgs = 0
    for root, _dirs, files in os.walk(img_dir):
        n_imgs += sum(1 for f in files if f.endswith(".png"))
    result["stage3"]["images_dumped"] = n_imgs

    result["chain_ok"] = (result["stage1"]["rc"] == 0
                          and result["stage2"]["rc"] == 0
                          and result["stage3"]["rc"] == 0
                          and n_imgs > 0)
    _finish(result, bench_dir, args.smoke)


def _best_ckpt(exp: str, name: str):
    """Path of the run's best checkpoint (direction depends on the preset:
    cityscapes runs save model_best_BtoA, synthetic AtoB)."""
    import glob
    hits = sorted(glob.glob(os.path.join(exp, name, "checkpoints",
                                         "model_best_*.ckpt")))
    return hits[0] if hits else None


def _finish(result, bench_dir, smoke):
    result["ts"] = time.time()
    out = os.path.join(bench_dir, "workflow_demo_smoke.json" if smoke
                       else "workflow_demo_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()
