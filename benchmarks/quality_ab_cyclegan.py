"""CycleGAN quality A/B: does the GCC cooperative machinery buy measurable
quality at equal step count for the UNPAIRED family too?

Companion to quality_ab.py (pix2pix). Same design: one pruned student
architecture, same data stream, same LR schedule, same iteration count;
  gcc:   full cooperative step (online teachers both directions,
         content/gram distill, DARTS-masked Ds, device-resident pools)
  plain: same students with plain CycleGAN losses (GAN + cycle + identity)
         and unmasked Ds.

Synthetic UNPAIRED task with a known oracle map: domain A images are smooth
random blob fields; domain B images are T(x) = -sign(x)*x^2 of *different*
blob fields (disjoint latent seeds — the loaders never see a pair). T is
invertible (T^-1(y) = -sign(y)*sqrt|y|), so cycle consistency is learnable
and eval can score G_AtoB against the oracle on held-out A.

Metrics on a held-out set: L1/PSNR of G_AtoB(A_val) vs T(A_val) (oracle),
pixel-Frechet of G_AtoB(A_val) against real-B samples, and the same for the
B->A direction. Writes benchmarks/quality_ab_cyclegan_result.json.

Run (TPU or CPU): python benchmarks/quality_ab_cyclegan.py [--epochs 40]
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
from quality_ab import pixel_frechet  # noqa: E402  (same proxy metric)


def blobs(index: int, size: int, seed: int, skew: float = 0.0) -> np.ndarray:
    # 16x16 latents -> enough spatial texture that InstanceNorm statistics
    # are meaningful (8x8 fields are near-flat: IN divides by a tiny std and
    # amplifies noise, destabilizing both branches equally).
    # skew > 0 raises the uniform latent to a power BEFORE quantization:
    # the pixel marginal becomes asymmetric (mass piles toward -1), which is
    # what makes the 'monotone' task identifiable (below).
    from PIL import Image
    rng = np.random.RandomState(seed * 100003 + index * 31)
    low = rng.rand(16, 16, 3).astype(np.float32)
    if skew:
        low = low ** (1.0 + skew)
    x = np.asarray(Image.fromarray((low * 255).astype(np.uint8)).resize(
        (size, size), Image.BICUBIC), np.float32) / 255.0 * 2 - 1
    return x.astype(np.float32)


# --- task 'squaresign' (the original): invertible but NON-identifiable ----
# The blob marginal is symmetric under x -> -x and T is odd-symmetric
# (T(-x) = -T(x)), so G = T o neg matches dist(B) and satisfies cycle
# consistency exactly as well as T does: the training objective cannot
# prefer the oracle. Kept for continuity with earlier rounds.

def oracle_T(x: np.ndarray) -> np.ndarray:
    return (-np.sign(x) * x * x).astype(np.float32)


def oracle_T_inv(y: np.ndarray) -> np.ndarray:
    return (-np.sign(y) * np.sqrt(np.abs(y))).astype(np.float32)


# --- task 'monotone': IDENTIFIABLE (VERDICT r3 #6) ------------------------
# Two symmetry breaks: (1) the A marginal is skewed (blobs skew=1.0), so no
# sign-flip competitor preserves dist(A); (2) T is strictly monotone
# increasing and the eval target is the unique monotone transport map
# between the marginals — the solution GAN+cycle+identity training actually
# favors. gamma=1.7 keeps |T'| bounded on [-1,1].

_GAMMA = 1.7


def oracle_T_mono(x: np.ndarray) -> np.ndarray:
    u = np.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return (2.0 * u ** _GAMMA - 1.0).astype(np.float32)


def oracle_T_mono_inv(y: np.ndarray) -> np.ndarray:
    u = np.clip((y + 1.0) / 2.0, 0.0, 1.0)
    return (2.0 * u ** (1.0 / _GAMMA) - 1.0).astype(np.float32)


TASKS = {
    "squaresign": (oracle_T, oracle_T_inv, 0.0),
    "monotone": (oracle_T_mono, oracle_T_mono_inv, 1.0),
}


def make_domains(n: int, size: int, seed_a: int, seed_b: int,
                 task: str = "squaresign"):
    """Unpaired: A from one latent family, B = T(latents from another)."""
    T, _, skew = TASKS[task]
    A = np.stack([blobs(i, size, seed_a, skew) for i in range(n)])
    B = np.stack([T(blobs(i, size, seed_b, skew)) for i in range(n)])
    return A, B


def evaluate(eng, state, A_val, B_val, jnp, task="squaresign"):
    T, T_inv, _ = TASKS[task]
    out = {}
    fake_B = np.asarray(eng.generate(state, jnp.asarray(A_val), "AtoB"),
                        np.float32)
    tgt_B = T(A_val)
    out["AtoB_L1"] = float(np.abs(fake_B - tgt_B).mean())
    mse = float(((fake_B - tgt_B) ** 2).mean())
    out["AtoB_PSNR"] = 10 * np.log10(4.0 / max(mse, 1e-12))
    out["AtoB_pixelFID"] = pixel_frechet(fake_B, B_val)
    fake_A = np.asarray(eng.generate(state, jnp.asarray(B_val), "BtoA"),
                        np.float32)
    tgt_A = T_inv(B_val)
    out["BtoA_L1"] = float(np.abs(fake_A - tgt_A).mean())
    mse = float(((fake_A - tgt_A) ** 2).mean())
    out["BtoA_PSNR"] = 10 * np.log10(4.0 / max(mse, 1e-12))
    out["BtoA_pixelFID"] = pixel_frechet(fake_A, A_val)
    return {k: round(v, 5) for k, v in out.items()}


def run_branch(kind: str, cfgs, args, jnp, jax):
    from gcc_tpu.config import Config
    from gcc_tpu.engines.cyclegan import CycleGANEngine
    from gcc_tpu.utils.schedule import lr_for_epoch, ema_beta_for_epoch

    gcc = kind == "gcc"
    cfg = Config(model="cyclegan", ngf=args.ngf, ndf=args.ndf,
                 teacher_ngf=args.teacher_ngf, teacher_ndf=args.teacher_ndf,
                 crop_size=args.size, gan_mode="lsgan",
                 online_distillation=gcc, darts_discriminator=gcc,
                 lambda_content=0.01 if gcc else 0.0,   # reference train.sh
                 lambda_gram=10.0 if gcc else 0.0,
                 pool_size=args.pool, lambda_A=10.0, lambda_B=10.0,
                 lambda_identity=0.5,
                 n_epochs=args.epochs, n_epochs_decay=0, lr=2e-4)
    eng = CycleGANEngine(cfg, cfg_AtoB=cfgs[0], cfg_BtoA=cfgs[1])
    state = eng.init_state(jax.random.PRNGKey(args.seed))

    A_tr, B_tr = make_domains(args.train_n, args.size, seed_a=11, seed_b=22,
                              task=args.task)
    A_val, B_val = make_domains(args.val_n, args.size, seed_a=33, seed_b=44,
                                task=args.task)
    n_batches = args.train_n // args.batch
    order_rng = np.random.RandomState(args.seed)
    # separate stream for darts val batches (keeps both branches' shuffle
    # orders identical)
    val_rng = np.random.RandomState(args.seed + 1)

    curve = []
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        lr = lr_for_epoch(cfg, epoch)
        beta = ema_beta_for_epoch(cfg, epoch)
        perm_a = order_rng.permutation(args.train_n)
        perm_b = order_rng.permutation(args.train_n)  # unpaired shuffles
        for bi in range(n_batches):
            ia = perm_a[bi * args.batch:(bi + 1) * args.batch]
            ib = perm_b[bi * args.batch:(bi + 1) * args.batch]
            batch = {"A": jnp.asarray(A_tr[ia]), "B": jnp.asarray(B_tr[ib])}
            if gcc:
                va = val_rng.randint(0, args.train_n, args.batch)
                vb = val_rng.randint(0, args.train_n, args.batch)
                val_b = {"A": jnp.asarray(A_tr[va]),
                         "B": jnp.asarray(B_tr[vb])}
                state, m = eng.train_arch_step(state, batch, val_b, lr, beta)
            else:
                state, m = eng.train_step(state, batch, lr)
        if epoch % args.eval_every == 0 or epoch == args.epochs:
            ev = evaluate(eng, state, A_val, B_val, jnp, args.task)
            curve.append({"epoch": epoch, **ev})
            print(f"[{kind}] epoch {epoch:3d}  " +
                  "  ".join(f"{k} {v}" for k, v in ev.items()), flush=True)
    return {"kind": kind, "curve": curve,
            "wall_sec": round(time.time() - t0, 1), "final": curve[-1]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ngf", type=int, default=12)
    p.add_argument("--ndf", type=int, default=16)
    p.add_argument("--teacher_ngf", type=int, default=24)
    p.add_argument("--teacher_ndf", type=int, default=24)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--train_n", type=int, default=256)
    p.add_argument("--val_n", type=int, default=64)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--pool", type=int, default=16)
    p.add_argument("--prune_frac", type=float, default=0.25,
                   help="student MACs as a fraction of the dense student "
                        "(capacity-starved: the GCC regime)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--task", default="squaresign", choices=sorted(TASKS),
                   help="squaresign = original (invertible, NON-identifiable"
                        "); monotone = identifiable variant (skewed marginal"
                        " + monotone transport oracle)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "quality_ab_cyclegan_result.json"))
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # pruned per-direction cfgs from sparsity-spread weights (bench.py recipe)
    from gcc_tpu.compress import prune_mobile_resnet
    from gcc_tpu.compress.macs import mobile_resnet_macs
    from gcc_tpu.models.generators import MobileResnetGenerator
    rng_np = np.random.RandomState(0)
    g_full = MobileResnetGenerator(ngf=args.ngf)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k},
                              jnp.zeros((1, args.size, args.size, 3))),
        jax.random.PRNGKey(0))["params"]

    def spread(seed):
        r = np.random.RandomState(seed)
        return jax.tree_util.tree_map(
            lambda s: (r.rand(*s.shape).astype(np.float32)
                       * np.exp(r.uniform(-6, 2, s.shape[-1])
                                ).astype(np.float32)), shapes)

    dense_g = mobile_resnet_macs(None, ngf=args.ngf,
                                 image_size=args.size) / 1e9
    cfgs, gots = [], []
    for seed in (1, 2):
        c, got = prune_mobile_resnet(
            spread(seed), target_budget_g=dense_g * args.prune_frac,
            tolerance_g=dense_g * 0.05, image_size=args.size)
        cfgs.append(c)
        gots.append(round(got, 4))
    print(f"students pruned to {gots} GMACs (dense {dense_g:.4f})",
          flush=True)

    results = {
        "config": {k: getattr(args, k) for k in
                   ("epochs", "size", "ngf", "ndf", "teacher_ngf",
                    "teacher_ndf", "batch", "train_n", "val_n", "pool",
                    "prune_frac", "seed", "task")},
        "student_gmacs": gots,
        "backend": jax.default_backend(),
        "branches": [run_branch("plain", cfgs, args, jnp, jax),
                     run_branch("gcc", cfgs, args, jnp, jax)],
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"plain_final": results["branches"][0]["final"],
                      "gcc_final": results["branches"][1]["final"]}))


if __name__ == "__main__":
    main()
