"""Headline benchmark: images/sec/chip for the pix2pix-cityscapes GCC
cooperative train step (BASELINE.json metric).

The benchmarked iteration is the reference's full per-iteration work
(train.py:144-151): teacher fwd+bwd+update, student D update, student G
update with distillation, plus the DARTS arch step on a second batch —
i.e. everything GCC does per image, not just a generator forward.

vs_baseline normalizes by an estimated single-V100 reference throughput.
The reference publishes no numbers (BASELINE.md); the estimate below is
derived from the step's FLOP count: teacher (ngf64 U-Net, 18.1 GMACs fwd) +
student (3.0 GMACs budget) + both PatchGANs, ~0.5 TFLOP/iter at batch 1,
against ~4.5 TFLOP/s sustained fp32 V100 torch throughput with Python/hook
overhead => ~6 images/sec. Recorded as V100_BASELINE_IMGS_PER_SEC.

Usage: python bench.py [--smoke] [--batch N] [--steps N]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

V100_BASELINE_IMGS_PER_SEC = 6.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU-sized config (CI smoke)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--infer", action="store_true",
                   help="measure pruned-generator inference throughput "
                        "instead of the training iteration")
    args = p.parse_args()
    if args.steps < 1:
        p.error("--steps must be >= 1")

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.compress import prune_unet

    if args.smoke:
        size, ngf, ndf, tngf, tndf, downs = 32, 4, 4, 8, 8, 5
        batch = args.batch or 2
        student_cfgs = (None, None)
    else:
        size, ngf, ndf, tngf, tndf, downs = 256, 32, 128, 64, 128, 8
        batch = args.batch or 64  # batch sweep: 64 ~ +22% over 16 on v5e
        # realistic pruned student: derive a 3.0 GMACs cfg from spread weights
        from gcc_tpu.models.generators import UnetGenerator
        rng_np = np.random.RandomState(0)
        g_full = UnetGenerator(ngf=ngf, num_downs=downs)
        shapes = jax.eval_shape(
            lambda k: g_full.init({"params": k, "dropout": k},
                                  jnp.zeros((1, size, size, 3))),
            jax.random.PRNGKey(0))["params"]
        params = jax.tree_util.tree_map(
            lambda s: (rng_np.rand(*s.shape).astype(np.float32)
                       * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                                ).astype(np.float32)), shapes)
        fc, cc, _ = prune_unet(params, mode="scale", ngf=ngf,
                               target_budget_g=3.0, tolerance_g=0.1,
                               num_downs=downs, image_size=size)
        student_cfgs = (fc, cc)

    if args.infer:
        # serving throughput of the pruned student generator (eval mode)
        import time as _t
        from gcc_tpu.models.generators import UnetGenerator
        g = UnetGenerator(ngf=ngf, num_downs=downs,
                          filter_cfgs=student_cfgs[0],
                          channel_cfgs=student_cfgs[1], use_dropout=False)
        x = jnp.asarray(np.random.RandomState(2).rand(batch, size, size, 3)
                        * 2 - 1,
                        jnp.bfloat16 if jax.default_backend() == "tpu"
                        else jnp.float32)
        v = g.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x[:1], train=False)
        fn = jax.jit(lambda v, x: g.apply(v, x, train=False))
        y = fn(v, x)
        _ = float(y[0, 0, 0, 0])
        t0 = _t.perf_counter()
        for _i in range(args.steps):
            y = fn(v, x)
        _ = float(y[0, 0, 0, 0])
        dt = _t.perf_counter() - t0
        ips = batch * args.steps / dt / jax.local_device_count()
        print(json.dumps({
            "metric": "inference images/sec/chip",
            "value": round(ips, 3),
            "unit": "images/sec/chip (pruned pix2pix student, eval)",
            "vs_baseline": round(ips / (V100_BASELINE_IMGS_PER_SEC * 12),
                                 3),  # ~12x train-step cost ratio
        }))
        return

    cfg = Config(model="pix2pix", ngf=ngf, ndf=ndf, teacher_ngf=tngf,
                 teacher_ndf=tndf, crop_size=size, num_downs=downs,
                 lambda_L1=100.0, gan_mode="hinge", online_distillation=True,
                 darts_discriminator=True, lambda_content=50.0,
                 lambda_gram=1e4, lr=2e-4, arch_lr=1e-4)
    eng = Pix2PixEngine(cfg, filter_cfgs=student_cfgs[0],
                        channel_cfgs=student_cfgs[1])
    state = eng.init_state(jax.random.PRNGKey(0))

    rng_np = np.random.RandomState(1)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def make_batch():
        return {"A": jnp.asarray(rng_np.rand(batch, size, size, 3) * 2 - 1,
                                 dtype),
                "B": jnp.asarray(rng_np.rand(batch, size, size, 3) * 2 - 1,
                                 dtype)}

    train_b, val_b = make_batch(), make_batch()

    def sync(x):
        # host pull: block_until_ready under-waits over the axon TPU tunnel
        return float(jax.tree_util.tree_leaves(x)[0])

    for _ in range(args.warmup):
        state, m = eng.train_arch_step(state, train_b, val_b, 2e-4, 0.9)
    sync(m)

    # three timing windows; best window defends against tunnel jitter
    window = max(1, args.steps // 3)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(window):
            state, m = eng.train_arch_step(state, train_b, val_b, 2e-4, 0.9)
        sync(m)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    n_chips = jax.local_device_count()
    imgs_per_sec_chip = batch * window / dt / n_chips
    print(json.dumps({
        "metric": "images/sec/chip",
        "value": round(imgs_per_sec_chip, 3),
        "unit": "images/sec/chip (pix2pix-cityscapes GCC cooperative step)",
        "vs_baseline": round(imgs_per_sec_chip / V100_BASELINE_IMGS_PER_SEC,
                             3),
    }))


if __name__ == "__main__":
    sys.exit(main())
