"""SAGAN quality A/B: does the GCC cooperative machinery buy measurable
quality at equal step count for the noise-to-image family?

Companion to quality_ab.py / quality_ab_cyclegan.py / quality_ab_srgan.py —
with this, all four families have equal-steps GCC-vs-plain evidence.
  gcc:   full cooperative step (online teacher G/D, content/gram distill,
         DARTS-masked D; TTUR preserved)
  plain: same pruned student generator with plain hinge GAN training.

Task: a fixed synthetic image distribution (smooth blob fields with a
shared global color palette, 64x64 — SAGAN's celeb protocol). The
only meaningful metric for a pure generator is distributional: the
pixel-Frechet proxy (same Frechet math as FID over 8x8-pooled pixel
features) between a fixed bank of generated samples and held-out real
samples, plus the generated-marginal channel-mean/std gap. Writes
benchmarks/quality_ab_sagan_result.json.

Run (TPU or CPU): python benchmarks/quality_ab_sagan.py [--epochs 60]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from quality_ab import pixel_frechet  # noqa: E402


def real_image(index: int, size: int, seed: int) -> np.ndarray:
    """Smooth blobs pushed through a fixed nonlinearity + palette so the
    target distribution has structure (correlated channels, heavy tails)."""
    from PIL import Image
    rng = np.random.RandomState(seed * 100003 + index * 31)
    low = rng.rand(6, 6, 3).astype(np.float32)
    x = np.asarray(Image.fromarray((low * 255).astype(np.uint8)).resize(
        (size, size), Image.BICUBIC), np.float32) / 255.0
    # fixed palette mix: channels become correlated
    mix = np.array([[0.7, 0.2, 0.1], [0.15, 0.7, 0.15], [0.1, 0.3, 0.6]],
                   np.float32)
    x = x @ mix.T
    return (np.clip(x, 0, 1) ** 1.5 * 2 - 1).astype(np.float32)


def make_reals(n: int, size: int, seed: int) -> np.ndarray:
    return np.stack([real_image(i, size, seed) for i in range(n)])


def evaluate(eng, state, z_bank, real_val, jnp):
    fakes = np.asarray(eng.generate(state, jnp.asarray(z_bank)), np.float32)
    pfid = pixel_frechet(fakes, real_val)
    mean_gap = float(np.abs(fakes.mean((0, 1, 2))
                            - real_val.mean((0, 1, 2))).mean())
    std_gap = float(np.abs(fakes.std((0, 1, 2))
                           - real_val.std((0, 1, 2))).mean())
    return {"pixelFID": round(pfid, 5), "mean_gap": round(mean_gap, 5),
            "std_gap": round(std_gap, 5)}


def run_branch(kind: str, filter_cfgs, args, jnp, jax):
    from gcc_tpu.config import Config
    from gcc_tpu.engines.sagan import SAGANEngine
    from gcc_tpu.utils.schedule import lr_for_epoch, ema_beta_for_epoch

    gcc = kind == "gcc"
    cfg = Config(model="sagan", ngf=args.ngf, ndf=args.ndf,
                 teacher_ngf=args.teacher_ngf, teacher_ndf=args.teacher_ndf,
                 crop_size=args.size, z_dim=args.z_dim, gan_mode="hinge",
                 online_distillation=gcc, darts_discriminator=gcc,
                 lambda_content=1.0 if gcc else 0.0,  # reference train.sh
                 lambda_gram=1.0 if gcc else 0.0,
                 n_epochs=args.epochs, n_epochs_decay=0, lr=1e-4)
    eng = SAGANEngine(cfg, filter_cfgs=filter_cfgs)
    state = eng.init_state(jax.random.PRNGKey(args.seed))

    reals = make_reals(args.train_n, args.size, seed=1)
    real_val = make_reals(args.val_n, args.size, seed=2)
    z_rng = np.random.RandomState(args.seed + 100)
    z_bank = np.asarray(np.random.RandomState(999).randn(
        args.val_n, args.z_dim), np.float32)  # fixed eval latents
    n_batches = args.train_n // args.batch
    order_rng = np.random.RandomState(args.seed)
    # separate streams for darts val batches: the gcc branch must not
    # advance order_rng/z_rng, or branches see different train data
    val_rng = np.random.RandomState(args.seed + 1)

    curve = []
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        lr = lr_for_epoch(cfg, epoch)
        beta = ema_beta_for_epoch(cfg, epoch)
        perm = order_rng.permutation(args.train_n)
        for bi in range(n_batches):
            idx = perm[bi * args.batch:(bi + 1) * args.batch]
            batch = {"z": jnp.asarray(z_rng.randn(
                         args.batch, args.z_dim).astype(np.float32)),
                     "real_img": jnp.asarray(reals[idx])}
            if gcc:
                vi = val_rng.randint(0, args.train_n, args.batch)
                val_b = {"z": jnp.asarray(val_rng.randn(
                             args.batch, args.z_dim).astype(np.float32)),
                         "real_img": jnp.asarray(reals[vi])}
                state, m = eng.train_arch_step(state, batch, val_b, lr, beta)
            else:
                state, m = eng.train_step(state, batch, lr)
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            ev = evaluate(eng, state, z_bank, real_val, jnp)
            curve.append({"epoch": epoch, **ev})
            print(f"[{kind}] epoch {epoch:3d}  " +
                  "  ".join(f"{k} {v}" for k, v in ev.items()), flush=True)
    return {"kind": kind, "curve": curve,
            "wall_sec": round(time.time() - t0, 1), "final": curve[-1]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--size", type=int, default=64)  # SAGAN topology is 4 fixed deconv stages -> 64^2 output
    p.add_argument("--z_dim", type=int, default=32)
    p.add_argument("--ngf", type=int, default=16)
    p.add_argument("--ndf", type=int, default=16)
    p.add_argument("--teacher_ngf", type=int, default=32)
    p.add_argument("--teacher_ndf", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--train_n", type=int, default=256)
    p.add_argument("--val_n", type=int, default=128)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--prune_frac", type=float, default=0.35,
                   help="student MACs as a fraction of the dense student")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "quality_ab_sagan_result.json"))
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # pruned student: derive filter_cfgs from spread BN scales (scale_prune,
    # the reference's SAGAN prune mode, models/SAGAN.py:726-750)
    from gcc_tpu.compress import prune_sagan
    from gcc_tpu.compress.macs import sagan_macs
    from gcc_tpu.models.generators import SAGANGenerator
    rng_np = np.random.RandomState(0)
    g_full = SAGANGenerator(ngf=args.ngf, image_size=args.size,
                            z_dim=args.z_dim)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k},
                              jnp.zeros((1, args.z_dim))),
        jax.random.PRNGKey(0))["params"]

    def spread_leaf(s):
        base = np.asarray(rng_np.rand(*s.shape), np.float32)
        if not s.shape:
            return base
        return base * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                             ).astype(np.float32)

    params = jax.tree_util.tree_map(spread_leaf, shapes)
    dense_g = sagan_macs(None, z_dim=args.z_dim, image_size=args.size,
                         ngf=args.ngf) / 1e9
    fc, got = prune_sagan(params, target_budget_g=dense_g * args.prune_frac,
                          tolerance_g=dense_g * 0.1, z_dim=args.z_dim,
                          image_size=args.size)
    print(f"student pruned to {got:.5f} GMACs (dense {dense_g:.5f}); "
          f"cfg={fc}", flush=True)

    results = {
        "config": {k: getattr(args, k) for k in
                   ("epochs", "size", "z_dim", "ngf", "ndf", "teacher_ngf",
                    "teacher_ndf", "batch", "train_n", "val_n",
                    "prune_frac", "seed")},
        "student_gmacs": round(got, 5),
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
