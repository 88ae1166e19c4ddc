"""HBM memory budget of the compiled cooperative step, per family.

The roofline work (perf_families.py, hbm_stream_probe.py) measured time;
this measures SPACE: XLA's own buffer-assignment stats
(compiled.memory_analysis()) for the exact fused train+arch program at the
canonical reference shapes — peak HBM, argument (state+batch) bytes, temp
bytes, code size. Compiling the same program at 2x batch gives the
per-image slope, from which the max trainable batch on a 16 GB v5e chip is
extrapolated (compile-only: .lower() takes ShapeDtypeStructs, so the 2x
point costs no device memory).

Why it matters: the batch knee measured in bench.py (128 for pix2pix) is a
THROUGHPUT optimum; this artifact shows how far the knee sits below the
memory wall, i.e. the headroom remat/donation currently buys. The reference
has no equivalent accounting (torch.cuda.max_memory_allocated is never
called anywhere in /root/reference).

Run: python benchmarks/memory_budget.py [--families pix2pix,cyclegan,...]
Writes benchmarks/memory_budget_result.json; prints one JSON line/family.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_HBM_BYTES = 16 * 1024 ** 3  # 16 GiB per chip

CANONICAL_BATCH = {"pix2pix": 128, "cyclegan": 16, "srgan": 128,
                   "sagan": 256}


def build_pix2pix(batch: int):
    """bench.py's exact non-smoke setup (256^2 cityscapes shapes, 3.0 GMACs
    pruned student, teacher 64/128)."""
    import jax
    import jax.numpy as jnp
    from gcc_tpu.compress import prune_unet
    from gcc_tpu.config import Config
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    from gcc_tpu.models.generators import UnetGenerator

    size, ngf, ndf, tngf, tndf, downs = 256, 32, 128, 64, 128, 8
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
    cfg = Config(model="pix2pix", ngf=ngf, ndf=ndf, teacher_ngf=tngf,
                 teacher_ndf=tndf, crop_size=size, num_downs=downs,
                 lambda_L1=100.0, gan_mode="hinge", online_distillation=True,
                 darts_discriminator=True, lambda_content=50.0,
                 lambda_gram=1e4, lr=2e-4, arch_lr=1e-4)
    eng = Pix2PixEngine(cfg, filter_cfgs=fc, channel_cfgs=cc)
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32

    def mk():
        r = np.random.RandomState(1)
        return {"A": jnp.asarray(r.rand(batch, size, size, 3) * 2 - 1, dtype),
                "B": jnp.asarray(r.rand(batch, size, size, 3) * 2 - 1, dtype)}

    return eng, mk(), mk()


def _abstract(tree):
    import jax
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


def _scale_batch(tree, factor: int):
    """ShapeDtypeStruct copy of a batch pytree with the leading dim scaled."""
    import jax

    def leaf(a):
        shape = (a.shape[0] * factor,) + tuple(a.shape[1:])
        return jax.ShapeDtypeStruct(shape, a.dtype)

    return jax.tree_util.tree_map(leaf, tree)


def _mem(eng, state, batch_d, val_d):
    import jax.numpy as jnp
    ms = eng.combined_jit.lower(
        state, batch_d, val_d, jnp.float32(2e-4), jnp.float32(0.9),
        jnp.float32(eng.cfg.arch_lr)).compile().memory_analysis()
    return {
        "peak": int(ms.peak_memory_in_bytes),
        "arguments": int(ms.argument_size_in_bytes),
        "outputs": int(ms.output_size_in_bytes),
        "temps": int(ms.temp_size_in_bytes),
        "code": int(ms.generated_code_size_in_bytes),
        "aliased": int(ms.alias_size_in_bytes),
    }


def measure_family(name: str, batch: int) -> dict:
    import jax

    if name == "pix2pix":
        eng, batch_d, val_d = build_pix2pix(batch)
    else:
        from perf_families import build_family
        eng, batch_d, val_d = build_family(name, batch)
    state = eng.init_state(jax.random.PRNGKey(0))

    m1 = _mem(eng, state, batch_d, val_d)
    # 2x batch, abstract args: compile-only, no HBM touched
    m2 = _mem(eng, _abstract(state), _scale_batch(batch_d, 2),
              _scale_batch(val_d, 2))

    per_img = (m2["peak"] - m1["peak"]) / batch  # bytes/image slope
    fixed = m1["peak"] - per_img * batch
    # ADVICE r3: when the peak is dominated by batch-independent temps the
    # slope is ~0 and a linear extrapolation is nonsense (cyclegan at batch 16
    # "supports batch 4579" while already at 13.9/16 GiB). Only report a max
    # batch when the batch-dependent share is a meaningful fraction of the
    # peak; otherwise flag the estimate as unreliable.
    slope_share = (per_img * batch / m1["peak"]) if m1["peak"] else 0.0
    if per_img > 0 and slope_share >= 0.05:
        max_batch = int((V5E_HBM_BYTES - fixed) / per_img)
        slope_reliable = True
    else:
        max_batch = None
        slope_reliable = False
    out = {
        "family": name,
        "batch": batch,
        "peak_hbm_gb": round(m1["peak"] / 1024 ** 3, 3),
        "peak_hbm_gb_2x_batch": round(m2["peak"] / 1024 ** 3, 3),
        "arguments_gb": round(m1["arguments"] / 1024 ** 3, 3),
        "temps_gb": round(m1["temps"] / 1024 ** 3, 3),
        "aliased_gb": round(m1["aliased"] / 1024 ** 3, 3),
        "code_mb": round(m1["code"] / 1024 ** 2, 2),
        "bytes_per_image": int(per_img),
        "fixed_bytes": int(fixed),
        "est_max_batch_16gb": max_batch,
        "slope_reliable": slope_reliable,
        "batch_dependent_share_of_peak": round(slope_share, 4),
        "headroom_vs_knee": (round(max_batch / batch, 2)
                             if max_batch else None),
        "pct_of_hbm_at_knee": round(100 * m1["peak"] / V5E_HBM_BYTES, 1),
    }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--families", default="pix2pix,cyclegan,srgan,sagan")
    args = p.parse_args()

    import jax
    results = {"backend": jax.default_backend(),
               "hbm_bytes_assumed": V5E_HBM_BYTES, "families": []}
    for name in args.families.split(","):
        name = name.strip()
        r = measure_family(name, CANONICAL_BATCH[name])
        print(json.dumps(r), flush=True)
        results["families"].append(r)

    full_default = args.families == "pix2pix,cyclegan,srgan,sagan"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "memory_budget_result.json")
    if full_default or not os.path.exists(path):
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
