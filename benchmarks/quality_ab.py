"""Quality A/B: does the GCC cooperative machinery buy measurable quality
at equal step count? (the algorithmic point of the paper, README.md:1).

Same pruned student architecture, same data stream, same LR schedule, same
number of iterations; two branches:
  gcc:   online teacher + content/gram distillation + DARTS-masked D
         (the full cooperative step)
  plain: the same student trained with plain GAN + L1 and an unmasked D
         (what you get without GCC)

Data is the deterministic synthetic aligned task (A = sign(B)*sqrt(|B|), so
the true mapping B = sign(A)*A^2 is learnable); quality is measured on a
held-out set as L1 to ground truth and PSNR, evaluated with the generator in
eval mode. Writes benchmarks/quality_ab_result.json and prints a table.

Run (TPU or CPU): python benchmarks/quality_ab.py [--epochs 30] [--size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def synth_pair(index: int, size: int, seed: int = 0):
    from PIL import Image
    rng = np.random.RandomState(seed * 100003 + index * 31)
    low = rng.rand(8, 8, 3).astype(np.float32)
    B = np.asarray(Image.fromarray((low * 255).astype(np.uint8)).resize(
        (size, size), Image.BICUBIC), np.float32) / 255.0 * 2 - 1
    A = np.sign(B) * np.abs(B) ** 0.5
    return A.astype(np.float32), B.astype(np.float32)


def make_split(n, size, seed=0):
    A = np.stack([synth_pair(i, size, seed)[0] for i in range(n)])
    B = np.stack([synth_pair(i, size, seed)[1] for i in range(n)])
    return A, B


def pixel_frechet(fakes: np.ndarray, reals: np.ndarray) -> float:
    """Distributional quality proxy: Frechet distance between 8x8-pooled
    pixel features of generated and real images (no evaluator weights
    needed; same Frechet math as FID, gcc_tpu.metrics.fid)."""
    from gcc_tpu.metrics.fid import frechet_distance

    def feats(x):
        n, h, w, c = x.shape
        f = x.reshape(n, 8, h // 8, 8, w // 8, c).mean((2, 4))
        return f.reshape(n, -1).astype(np.float64)

    ff, fr = feats(fakes), feats(reals)
    mu_f, mu_r = ff.mean(0), fr.mean(0)
    cov_f = np.cov(ff, rowvar=False)
    cov_r = np.cov(fr, rowvar=False)
    return float(frechet_distance(mu_f, cov_f, mu_r, cov_r))


def evaluate(eng, state, A_val, B_val, jnp):
    fake = np.asarray(eng.generate(state, jnp.asarray(A_val)), np.float32)
    l1 = float(np.abs(fake - B_val).mean())
    mse = float(((fake - B_val) ** 2).mean())
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> peak 2
    pfid = pixel_frechet(fake, B_val)
    return l1, psnr, pfid


def run_branch(kind: str, student_cfgs, args, jnp, jax):
    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.utils.schedule import lr_for_epoch, ema_beta_for_epoch

    gcc = kind == "gcc"
    cfg = Config(model="pix2pix", ngf=args.ngf, ndf=args.ndf,
                 teacher_ngf=args.teacher_ngf, teacher_ndf=args.teacher_ndf,
                 crop_size=args.size, num_downs=args.num_downs,
                 lambda_L1=100.0, gan_mode="hinge",
                 online_distillation=gcc, darts_discriminator=gcc,
                 lambda_content=50.0 if gcc else 0.0,
                 lambda_gram=1e4 if gcc else 0.0,
                 n_epochs=args.epochs, n_epochs_decay=0, lr=2e-4)
    eng = Pix2PixEngine(cfg, filter_cfgs=student_cfgs[0],
                        channel_cfgs=student_cfgs[1])
    state = eng.init_state(jax.random.PRNGKey(args.seed))

    A_tr, B_tr = make_split(args.train_n, args.size, seed=1)
    A_val, B_val = make_split(args.val_n, args.size, seed=2)
    n_batches = args.train_n // args.batch
    order_rng = np.random.RandomState(args.seed)
    # separate stream for darts val batches: the gcc branch must not
    # advance order_rng, or the two branches see different shuffle orders
    val_rng = np.random.RandomState(args.seed + 1)

    curve = []
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        lr = lr_for_epoch(cfg, epoch)
        beta = ema_beta_for_epoch(cfg, epoch)
        perm = order_rng.permutation(args.train_n)
        for bi in range(n_batches):
            idx = perm[bi * args.batch:(bi + 1) * args.batch]
            batch = {"A": jnp.asarray(A_tr[idx]), "B": jnp.asarray(B_tr[idx])}
            if gcc:
                vidx = val_rng.randint(0, args.train_n, args.batch)
                val_b = {"A": jnp.asarray(A_tr[vidx]),
                         "B": jnp.asarray(B_tr[vidx])}
                state, m = eng.train_arch_step(state, batch, val_b, lr, beta)
            else:
                state, m = eng.train_step(state, batch, lr)
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            l1, psnr, pfid = evaluate(eng, state, A_val, B_val, jnp)
            curve.append({"epoch": epoch, "val_L1": round(l1, 5),
                          "val_PSNR": round(psnr, 3),
                          "val_pixelFID": round(pfid, 5)})
            print(f"[{kind}] epoch {epoch:3d}  val_L1 {l1:.5f}  "
                  f"val_PSNR {psnr:.3f}  val_pixelFID {pfid:.5f}",
                  flush=True)
    return {"kind": kind, "curve": curve,
            "wall_sec": round(time.time() - t0, 1),
            "final": curve[-1]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--num_downs", type=int, default=6)
    p.add_argument("--ngf", type=int, default=16)
    p.add_argument("--ndf", type=int, default=32)
    p.add_argument("--teacher_ngf", type=int, default=32)
    p.add_argument("--teacher_ndf", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--train_n", type=int, default=256)
    p.add_argument("--val_n", type=int, default=64)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--prune_frac", type=float, default=0.5,
                   help="student MACs as a fraction of the dense student")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "quality_ab_result.json"))
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # pruned student: derive cfgs from sparsity-spread weights (same recipe
    # as bench.py), at ~half the dense student's MACs
    from gcc_tpu.compress import prune_unet
    from gcc_tpu.compress.macs import unet_macs
    from gcc_tpu.models.generators import UnetGenerator
    rng_np = np.random.RandomState(0)
    g_full = UnetGenerator(ngf=args.ngf, num_downs=args.num_downs)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k, "dropout": k},
                              jnp.zeros((1, args.size, args.size, 3))),
        jax.random.PRNGKey(0))["params"]
    params = jax.tree_util.tree_map(
        lambda s: (rng_np.rand(*s.shape).astype(np.float32)
                   * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                            ).astype(np.float32)), shapes)
    dense_g = unet_macs(None, num_downs=args.num_downs, ngf=args.ngf,
                        image_size=args.size) / 1e9
    fc, cc, got = prune_unet(params, mode="scale", ngf=args.ngf,
                             target_budget_g=dense_g * args.prune_frac,
                             tolerance_g=dense_g * 0.05,
                             num_downs=args.num_downs, image_size=args.size)
    print(f"student pruned to {got:.4f} GMACs (dense {dense_g:.4f})",
          flush=True)

    results = {
        "config": {k: getattr(args, k) for k in
                   ("epochs", "size", "num_downs", "ngf", "ndf",
                    "teacher_ngf", "teacher_ndf", "batch", "train_n",
                    "val_n", "prune_frac", "seed")},
        "student_gmacs": round(got, 4),
        "backend": jax.default_backend(),
        "branches": [run_branch("plain", (fc, cc), args, jnp, jax),
                     run_branch("gcc", (fc, cc), args, jnp, jax)],
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    plain = results["branches"][0]["final"]
    gcc = results["branches"][1]["final"]
    print(json.dumps({"plain_final": plain, "gcc_final": gcc}))


if __name__ == "__main__":
    main()
