"""The live lever behind sagan's arch-step gap: flash attention at N=1024.

The fusion table (benchmarks/sagan_arch_fusions.py) attributes 40% of the
arch step's device time to the two Pallas flash-attention kernels
(attn2.2/attn2.3). SAGAN's 64^2 topology runs attention at N = 32*32 =
1024 — exactly the flash kernel's cut-in, where its measured standalone win
was smallest (2.4x at f32 fwd+bwd; the arch step is bf16 and backprops to
INPUTS only, a different mix). This probe times the canonical arch step,
the full fused train+arch step, and generation with the flash kernel ON
(threshold 1024, shipped default) vs OFF (einsum path) at the canonical
batch, and reports which setting wins per step type.

If einsum wins for this family/shape, the fix is config-only:
--pallas_attn_threshold 2048 keeps the flash win for every N >= 2048 case
while letting XLA fuse the N=1024 case.

Run ALONE on the chip: python benchmarks/sagan_attn_lever.py [--batch 256]
Writes benchmarks/sagan_attn_lever_result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "sagan_attn_lever_result.json"))
    args = ap.parse_args()

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.steps = 8, 2
    import jax.numpy as jnp
    import numpy as np
    from gcc_tpu.engines.sagan import SAGANEngine
    from benchmarks.perf_families import build_family

    rows = []
    for thr, label in ((1024, "flash_pallas(default)"),
                       (1 << 30, "einsum_xla")):
        # build_family hard-codes the canonical sagan budget; rebuild with
        # the threshold override through the same recipe
        eng, batch_d, val_d = build_family("sagan", args.batch)
        if thr != eng.cfg.pallas_attn_threshold:
            eng = SAGANEngine(eng.cfg.replace(pallas_attn_threshold=thr),
                              filter_cfgs=eng.filter_cfgs,
                              channel_cfgs=eng.channel_cfgs)
        beta, alr = jnp.float32(0.9), jnp.float32(eng.cfg.arch_lr)
        lr = jnp.float32(2e-4)
        state = eng.init_state(jax.random.PRNGKey(0))

        def timed(fn, sync):
            out = fn()
            sync(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    out = fn()
                sync(out)
                times.append(time.perf_counter() - t0)
            return min(times) / args.steps * 1e3

        holder = {"s": state}

        def arch():
            holder["s"], l = eng._jit_arch(holder["s"], val_d, beta, alr)
            return l

        def full():
            holder["s"], l = eng.combined_jit(holder["s"], batch_d, val_d,
                                              lr, beta, alr)
            return l

        def gen():
            return eng.generate(holder["s"], batch_d["z"])

        sync_l = lambda l: float(  # noqa: E731
            jax.tree_util.tree_leaves(l)[0])
        sync_x = lambda x: float(jnp.asarray(x).ravel()[0])  # noqa: E731

        row = {"attention": label, "threshold": thr,
               "arch_ms": round(timed(arch, sync_l), 3),
               "full_step_ms": round(timed(full, sync_l), 3),
               "generate_ms": round(timed(gen, sync_x), 3),
               "batch": args.batch}
        row["full_step_imgs_per_sec"] = round(
            args.batch / (row["full_step_ms"] / 1e3), 1)
        print(json.dumps(row), flush=True)
        rows.append(row)

    a, b = rows
    result = {
        "probe": "sagan_attention_path_lever",
        "rows": rows,
        "arch_speedup_einsum_vs_flash": round(a["arch_ms"] / b["arch_ms"],
                                              3),
        "full_speedup_einsum_vs_flash": round(
            a["full_step_ms"] / b["full_step_ms"], 3),
    }
    if not args.smoke:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
