"""SRGAN quality A/B: does the GCC cooperative machinery buy measurable
quality at equal step count for the super-resolution family?

Companion to quality_ab.py (pix2pix) and quality_ab_cyclegan.py. Same
design: one pruned SRResNet student, same data stream, same schedule,
same iteration count;
  gcc:   full cooperative step (online SRResNet teacher + teacher D,
         content/gram distill, DARTS-masked D)
  plain: same student with the reference's plain SRGAN losses
         (MSE content + 1e-3 adversarial; perceptual disabled — no
         pretrained VGG in this environment, both branches equally).

Data: procedural smooth blob fields as HR (the SRDataset contract:
HR in [-1,1], LR bicubic /4 in imagenet-norm space,
gcc_tpu/data/datasets.py:129-148). Quality on held-out LR/HR pairs:
RGB PSNR + Y-channel PSNR (the reference's SRGAN protocol) and L1.
Writes benchmarks/quality_ab_srgan_result.json.

Run (TPU or CPU): python benchmarks/quality_ab_srgan.py [--epochs 40]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def hr_image(index: int, size: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed * 100003 + index * 31)
    low = rng.rand(8, 8, 3).astype(np.float32)
    img = Image.fromarray((low * 255).astype(np.uint8)).resize(
        (size, size), Image.BICUBIC)
    return img


def make_split(n: int, size: int, scale: int, seed: int):
    lrs, hrs = [], []
    for i in range(n):
        hr = hr_image(i, size, seed)
        lr = hr.resize((size // scale, size // scale), Image.BICUBIC)
        lr01 = np.asarray(lr, np.float32) / 255.0
        lrs.append((lr01 - IMAGENET_MEAN) / IMAGENET_STD)
        hrs.append(np.asarray(hr, np.float32) / 255.0 * 2 - 1)
    return (np.stack(lrs).astype(np.float32),
            np.stack(hrs).astype(np.float32))


def psnr(a: np.ndarray, b: np.ndarray, peak: float) -> float:
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(peak * peak / max(mse, 1e-12))


def y_channel(img_m11: np.ndarray) -> np.ndarray:
    """[-1,1] RGB -> luma in [16,235] (the reference PSNR protocol space)."""
    x = (img_m11 + 1) / 2 * 255.0
    return (16.0 + x[..., 0] * 65.738 / 256 + x[..., 1] * 129.057 / 256
            + x[..., 2] * 25.064 / 256)


def evaluate(eng, state, lr_val, hr_val, jnp):
    fake = np.asarray(eng.generate(state, jnp.asarray(lr_val)), np.float32)
    return {
        "L1": round(float(np.abs(fake - hr_val).mean()), 5),
        "PSNR_rgb": round(psnr(fake, hr_val, 2.0), 3),
        "PSNR_y": round(psnr(y_channel(fake), y_channel(hr_val), 255.0), 3),
    }


def run_branch(kind: str, filter_cfgs, args, jnp, jax):
    from gcc_tpu.config import Config
    from gcc_tpu.engines.srgan import SRGANEngine
    from gcc_tpu.utils.schedule import lr_for_epoch, ema_beta_for_epoch

    gcc = kind == "gcc"
    cfg = Config(model="srgan", ngf=args.ngf, ndf=args.ndf,
                 teacher_ngf=args.teacher_ngf, teacher_ndf=args.teacher_ndf,
                 image_size=args.size, upscale_factor=args.scale,
                 gan_mode="vanilla",
                 online_distillation=gcc, darts_discriminator=gcc,
                 lambda_content=0.1 if gcc else 0.0,  # reference train.sh
                 lambda_gram=0.1 if gcc else 0.0,
                 n_epochs=args.epochs, n_epochs_decay=0, lr=1e-4)
    eng = SRGANEngine(cfg, filter_cfgs=filter_cfgs)
    state = eng.init_state(jax.random.PRNGKey(args.seed))

    lr_tr, hr_tr = make_split(args.train_n, args.size, args.scale, seed=1)
    lr_val, hr_val = make_split(args.val_n, args.size, args.scale, seed=2)
    n_batches = args.train_n // args.batch
    order_rng = np.random.RandomState(args.seed)
    val_rng = np.random.RandomState(args.seed + 1)  # keeps branches' shuffle orders identical

    curve = []
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        lr = lr_for_epoch(cfg, epoch)
        beta = ema_beta_for_epoch(cfg, epoch)
        perm = order_rng.permutation(args.train_n)
        for bi in range(n_batches):
            idx = perm[bi * args.batch:(bi + 1) * args.batch]
            batch = {"lr": jnp.asarray(lr_tr[idx]),
                     "hr": jnp.asarray(hr_tr[idx])}
            if gcc:
                vi = val_rng.randint(0, args.train_n, args.batch)
                val_b = {"lr": jnp.asarray(lr_tr[vi]),
                         "hr": jnp.asarray(hr_tr[vi])}
                state, m = eng.train_arch_step(state, batch, val_b, lr, beta)
            else:
                state, m = eng.train_step(state, batch, lr)
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            ev = evaluate(eng, state, lr_val, hr_val, jnp)
            curve.append({"epoch": epoch, **ev})
            print(f"[{kind}] epoch {epoch:3d}  " +
                  "  ".join(f"{k} {v}" for k, v in ev.items()), flush=True)
    return {"kind": kind, "curve": curve,
            "wall_sec": round(time.time() - t0, 1), "final": curve[-1]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--size", type=int, default=64, help="HR crop size")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--ngf", type=int, default=16)
    p.add_argument("--ndf", type=int, default=16)
    p.add_argument("--teacher_ngf", type=int, default=32)
    p.add_argument("--teacher_ndf", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--train_n", type=int, default=256)
    p.add_argument("--val_n", type=int, default=64)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--prune_frac", type=float, default=0.25,
                   help="student MACs as a fraction of the dense student")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "quality_ab_srgan_result.json"))
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # pruned student: per-block inner widths from sparsity-spread weights
    from gcc_tpu.compress import prune_srresnet
    from gcc_tpu.compress.macs import srresnet_macs
    from gcc_tpu.models.generators import SRResNet
    rng_np = np.random.RandomState(0)
    lr_size = args.size // args.scale
    g_full = SRResNet(n_channels=args.ngf)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k},
                              jnp.zeros((1, lr_size, lr_size, 3))),
        jax.random.PRNGKey(0))["params"]
    def spread_leaf(s):
        base = np.asarray(rng_np.rand(*s.shape), np.float32)
        if not s.shape:  # scalar (PReLU alpha)
            return base
        return base * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                             ).astype(np.float32)

    params = jax.tree_util.tree_map(spread_leaf, shapes)
    dense_g = srresnet_macs(None, n_channels=args.ngf, lr_size=lr_size) / 1e9
    # only the residual-block inner widths are prunable (SRGAN.py:164-166);
    # the stem/mid/subpixel/out convs are fixed cost, so the budget is
    # floor + prune_frac * (dense - floor)
    floor_g = srresnet_macs([0] * 16, n_channels=args.ngf,
                            lr_size=lr_size) / 1e9
    target = floor_g + (dense_g - floor_g) * args.prune_frac
    fc, got = prune_srresnet(params, mode="norm", n_channels=args.ngf,
                             target_budget_g=target,
                             tolerance_g=(dense_g - floor_g) * 0.1,
                             lr_size=lr_size)
    print(f"student pruned to {got:.4f} GMACs (dense {dense_g:.4f}, "
          f"floor {floor_g:.4f}); cfg={fc}", flush=True)

    results = {
        "config": {k: getattr(args, k) for k in
                   ("epochs", "size", "scale", "ngf", "ndf", "teacher_ngf",
                    "teacher_ndf", "batch", "train_n", "val_n",
                    "prune_frac", "seed")},
        "student_gmacs": round(got, 4),
        "backend": jax.default_backend(),
        "branches": [run_branch("plain", fc, args, jnp, jax),
                     run_branch("gcc", fc, args, jnp, jax)],
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"plain_final": results["branches"][0]["final"],
                      "gcc_final": results["branches"][1]["final"]}))


if __name__ == "__main__":
    main()
