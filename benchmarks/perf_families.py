"""Per-family throughput of the FULL GCC cooperative iteration.

bench.py measures the flagship (pix2pix-cityscapes). This sweeps the other
three families at their reference shapes/budgets (BASELINE.md):
  cyclegan  horse2zebra 256^2, ngf 24 student pruned with the reference's
            hard-coded cfgs (utils/prune_util.py:120-121), teacher 64/64
  sagan     celeb 64^2, ngf 48 student pruned to 0.016 G, teacher 64/64
  srgan     /4, HR 96, ngf 24 student pruned to 0.20 G, teacher 64/64
Each measurement is the fused train+arch step (teacher + student D + student
G + darts arch step), best-of-3 timing windows, with XLA cost-analysis
FLOPs of the exact compiled program. Prints one JSON line per family.

Run: python benchmarks/perf_families.py [--steps 15] [--families cyclegan,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFS = 197.0
V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def _cost(engine, *args) -> tuple:
    """(flops, bytes accessed) of the exact compiled program, from XLA's own
    cost analysis; (None, None) when the backend doesn't expose it."""
    try:
        ca = engine._jit_combined.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]), float(ca.get("bytes accessed", 0)) or None
    except Exception:
        return None, None


def _spread_params(module, example, seed=0):
    import jax
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    shapes = jax.eval_shape(
        lambda k: module.init({"params": k, "dropout": k}, example),
        jax.random.PRNGKey(0))["params"]

    def leaf(s):
        base = np.asarray(rng.rand(*s.shape), np.float32)
        if not s.shape:
            return base
        return base * np.exp(rng.uniform(-6, 2, s.shape[-1])
                             ).astype(np.float32)

    return jax.tree_util.tree_map(leaf, shapes)


def build_family(name: str, batch: int):
    """Engine + train/val batches at the reference shapes/budgets for one
    family (shared by the throughput sweep below and
    benchmarks/serving_latency.py)."""
    import jax
    import jax.numpy as jnp
    from gcc_tpu.config import Config

    rng = np.random.RandomState(1)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def img(size, n=batch):
        return jnp.asarray(rng.rand(n, size, size, 3) * 2 - 1, dtype)

    if name == "cyclegan":
        from gcc_tpu.compress import cyclegan_reference_cfgs
        from gcc_tpu.engines.cyclegan import CycleGANEngine
        cfg_a, cfg_b = cyclegan_reference_cfgs()
        cfg = Config(
            model="cyclegan", ngf=24, ndf=64, teacher_ngf=64, teacher_ndf=64,
            crop_size=256, gan_mode="lsgan", online_distillation=True,
            darts_discriminator=True, lambda_content=0.01, lambda_gram=10.0,
            pool_size=50)
        eng = CycleGANEngine(cfg, cfg_AtoB=cfg_a, cfg_BtoA=cfg_b)
        batch_d = {"A": img(256), "B": img(256)}
        val_d = {"A": img(256), "B": img(256)}
    elif name == "sagan":
        from gcc_tpu.compress import prune_sagan
        from gcc_tpu.engines.sagan import SAGANEngine
        from gcc_tpu.models.generators import SAGANGenerator
        g = SAGANGenerator(ngf=48, z_dim=128)
        params = _spread_params(g, jnp.zeros((1, 128)))
        fc, _ = prune_sagan(params, target_budget_g=0.016,
                            tolerance_g=0.001, z_dim=128, image_size=64)
        cfg = Config(
            model="sagan", ngf=48, ndf=64, teacher_ngf=64, teacher_ndf=64,
            crop_size=64, z_dim=128, gan_mode="hinge",
            online_distillation=True, darts_discriminator=True,
            lambda_content=1.0, lambda_gram=1.0)
        eng = SAGANEngine(cfg, filter_cfgs=fc)
        z = jnp.asarray(rng.randn(batch, 128), dtype)
        batch_d = {"z": z, "real_img": img(64)}
        val_d = {"z": jnp.asarray(rng.randn(batch, 128), dtype),
                 "real_img": img(64)}
    elif name == "srgan":
        from gcc_tpu.compress import prune_srresnet
        from gcc_tpu.engines.srgan import SRGANEngine
        from gcc_tpu.models.generators import SRResNet
        g = SRResNet(n_channels=24)
        params = _spread_params(g, jnp.zeros((1, 24, 24, 3)))
        fc, _ = prune_srresnet(params, mode="norm", n_channels=24,
                               target_budget_g=0.20, tolerance_g=0.01,
                               lr_size=24)
        cfg = Config(
            model="srgan", ngf=24, ndf=64, teacher_ngf=64, teacher_ndf=64,
            image_size=96, upscale_factor=4, gan_mode="vanilla",
            online_distillation=True, darts_discriminator=True,
            lambda_content=0.1, lambda_gram=0.1)
        eng = SRGANEngine(cfg, filter_cfgs=fc)
        batch_d = {"lr": img(24), "hr": img(96)}
        val_d = {"lr": img(24), "hr": img(96)}
    else:
        raise ValueError(name)
    return eng, batch_d, val_d


def bench_family(name: str, batch: int, steps: int, infer: bool = False):
    import jax
    import jax.numpy as jnp

    eng, batch_d, val_d = build_family(name, batch)
    state = eng.init_state(jax.random.PRNGKey(0))

    if infer:
        # serving: pruned student generator, eval mode
        key = {"cyclegan": "A", "sagan": "z", "srgan": "lr"}[name]
        x = batch_d[key]
        gen = (lambda s, x: eng.generate(s, x, "AtoB")) \
            if name == "cyclegan" else eng.generate
        y = gen(state, x)
        _ = float(jax.tree_util.tree_leaves(y)[0].reshape(-1)[0])
        window = max(1, steps)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(window):
                y = gen(state, x)
            _ = float(jax.tree_util.tree_leaves(y)[0].reshape(-1)[0])
            times.append(time.perf_counter() - t0)
        ips = batch * window / min(times)
        print(json.dumps({"family": name,
                          "metric": "inference images/sec/chip",
                          "value": round(ips, 2), "batch": batch}),
              flush=True)
        return

    for _ in range(3):
        state, m = eng.train_arch_step(state, batch_d, val_d, 2e-4, 0.9)
    _ = float(jax.tree_util.tree_leaves(m)[0])  # tunnel-safe sync

    flops, nbytes = _cost(eng, state, batch_d, val_d, jnp.float32(2e-4),
                          jnp.float32(0.9), jnp.float32(eng.cfg.arch_lr))

    window = max(1, steps // 3)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(window):
            state, m = eng.train_arch_step(state, batch_d, val_d, 2e-4, 0.9)
        _ = float(jax.tree_util.tree_leaves(m)[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ips = batch * window / dt
    out = {"family": name, "metric": "images/sec/chip", "value": round(ips, 2),
           "batch": batch}
    if flops:
        tfs = ips * flops / batch / 1e12
        out.update({"tflop_per_image": round(flops / batch / 1e12, 4),
                    "measured_tf_per_sec_chip": round(tfs, 2),
                    "mfu_vs_v5e_peak": round(tfs / V5E_BF16_PEAK_TFS, 4)})
    if flops and nbytes:
        # Roofline from XLA's own cost model: arithmetic intensity (flop per
        # HBM byte) caps achievable TF/s at AI * BW until the compute peak.
        ai = flops / nbytes
        roof_tfs = min(V5E_BF16_PEAK_TFS, ai * V5E_HBM_GBPS / 1e3)
        out.update({
            "bytes_per_image_gb": round(nbytes / batch / 1e9, 4),
            "arithmetic_intensity_flop_per_byte": round(ai, 2),
            "roofline_tf_per_sec": round(roof_tfs, 2),
            "bound_by": ("bandwidth" if ai * V5E_HBM_GBPS / 1e3
                         < V5E_BF16_PEAK_TFS else "compute"),
            "pct_of_roofline": round(100.0 * (ips * flops / batch / 1e12)
                                     / roof_tfs, 1),
        })
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="cyclegan,sagan,srgan")
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--batch_cyclegan", type=int, default=16)  # memory-bound: flat 16 -> 32
    p.add_argument("--batch_sagan", type=int, default=256)  # knee: 3012@64 -> 4358@256
    p.add_argument("--batch_srgan", type=int, default=128)  # knee: 727@32 -> 1538@128, flat at 256
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--infer", action="store_true",
                   help="pruned-student generator serving throughput "
                        "(eval mode) instead of the training iteration")
    args = p.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    results = []
    for fam in args.families.split(","):
        r = bench_family(fam.strip(), getattr(args, f"batch_{fam.strip()}"),
                         args.steps, infer=args.infer)
        if r:
            results.append(r)
    # persist the canonical artifact only for a FULL default sweep — a
    # partial --families smoke run must not clobber the recorded numbers
    full = set(args.families.split(",")) == {"cyclegan", "sagan", "srgan"}
    if results and not args.infer and full:
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "perf_families_result.json")
        payload = {"backend": jax.default_backend(),
                   "device": str(jax.devices()[0]),
                   "ts": time.time(), "families": results}
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
