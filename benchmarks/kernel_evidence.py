"""Measured settlement of SURVEY §2.1's remaining custom-kernel targets.

§2.1 names four candidate kernel surfaces for the TPU rebuild. Two are
already settled at the build-and-measure standard:

  (d) self-attention  -> Pallas flash kernels, measured 1.9-2.4x over XLA
      (gcc_tpu/ops/pallas/attention.py, round 2).
  (a) fused conv+norm+act -> built as a full Pallas mobile-resnet block,
      measured 0.89x fwd / 0.74x fwd+bwd vs XLA, ships off
      (benchmarks/fused_block_result.json, round 3).

This harness settles the other two with measurements of the exact compiled
programs, not argument:

  (b) mask-weighted conv — DifferentiableOP's gate multiply folded into the
      neighboring conv (reference models/DifferentiableOp.py:47-49 applies
      the mask as a standalone NCHW multiply every forward). Claim to test:
      XLA already fuses our MaskGate multiply into adjacent work, so a
      custom masked-conv kernel has nothing left to win. Evidence: the
      masked PatchGAN (GCC student D: ndf=128, 4 gates) must match the
      unmasked one in measured wall time AND in XLA cost-analysis HBM bytes,
      far below the cost of unfused gating (one extra read+write of every
      gated activation).

  (c) gram-matrix loss — G = f f^T / (c h w) per tap pair (reference
      models/Pix2Pix.py:733-740). Claim to test: the distillation loss block
      (content + gram over the REAL tap shapes of the pix2pix GCC teacher,
      fwd + grad-to-student-feats as in backward_G) is a negligible Amdahl
      share of the cooperative step and already runs near the chip's HBM
      roofline, so a fused gram/content kernel cannot move the headline.
      Evidence: its own compiled program's achieved GB/s vs the v5e roof,
      its measured time vs the full step's, and XLA's bytes vs the
      ideal-fused minimum (read each feature tensor once).

Run on the TPU (axon tunnel up, no other TPU process — single-client).
Writes benchmarks/kernel_evidence_result.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_OUT = os.path.join(_HERE, "kernel_evidence_result.json")
_BENCH_JSON = os.path.join(_HERE, "bench_r3_run.json")

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def _sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _time(fn, *args, reps=8):
    """Best-of-3 windows of `reps` calls, host-pull synced (tunnel-safe)."""
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def _cost(lowered):
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


# ---------------------------------------------------------------------------
# (b) mask-weighted conv: masked vs plain PatchGAN, fwd and fwd+bwd
# ---------------------------------------------------------------------------

def evidence_masked_conv(batch=32, size=256, ndf=128):
    from gcc_tpu.models.discriminators import PatchGAN

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    x = jnp.asarray(np.random.RandomState(0).rand(batch, size, size, 6)
                    * 2 - 1, dtype)
    key = jax.random.PRNGKey(0)

    results = {}
    gated_nbytes = []

    for masked in (False, True):
        d = PatchGAN(ndf=ndf, norm="batch", masked=masked)
        variables = d.init(key, x, train=True)

        def fwd(v, x, d=d):
            out, _ = d.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32))

        def fwdbwd(v, x, d=d):
            # grad wrt params AND (for masked) arch alphas — exercises the
            # straight-through custom_vjp path the arch step uses
            diff = {k: v[k] for k in ("params", "arch") if k in v}
            rest = {k: v[k] for k in v if k not in diff}

            def loss(diff, x):
                out, _ = d.apply({**rest, **diff}, x, train=True,
                                 mutable=["batch_stats"])
                return jnp.mean(out.astype(jnp.float32))

            return jax.grad(loss)(diff, x)

        jf = jax.jit(fwd)
        jb = jax.jit(fwdbwd)
        fl_f, by_f = _cost(jf.lower(variables, x))
        fl_b, by_b = _cost(jb.lower(variables, x))
        results["masked" if masked else "plain"] = {
            "fwd_ms": round(_time(jf, variables, x) * 1e3, 3),
            "fwdbwd_ms": round(_time(jb, variables, x) * 1e3, 3),
            "fwd_bytes": by_f, "fwdbwd_bytes": by_b,
            "fwd_flops": fl_f,
        }
        if masked:
            # what UNFUSED gating would add: one read + one write of each
            # gated activation per pass (four gates in the student D)
            h, nf = size // 2, 1
            gated_nbytes.append(batch * h * h * ndf
                                * jnp.dtype(dtype).itemsize)
            for n in (1, 2, 3):
                nf = min(2 ** n, 8)
                if n < 3:
                    h = h // 2
                else:
                    h = h - 1  # stride-1 valid-ish 4x4 pad 1
                gated_nbytes.append(batch * h * h * ndf * nf
                                    * jnp.dtype(dtype).itemsize)

    unfused_extra = 2 * sum(gated_nbytes)
    measured_extra = (results["masked"]["fwd_bytes"]
                      - results["plain"]["fwd_bytes"])
    out = {
        "shapes": {"batch": batch, "size": size, "ndf": ndf,
                   "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                                else dtype)},
        "plain": results["plain"],
        "masked": results["masked"],
        "unfused_gate_extra_bytes_predicted_fwd": unfused_extra,
        "measured_extra_bytes_fwd": measured_extra,
        "fused_fraction": round(1.0 - measured_extra / unfused_extra, 4),
        "time_overhead_fwd": round(
            results["masked"]["fwd_ms"] / results["plain"]["fwd_ms"] - 1, 4),
        "time_overhead_fwdbwd": round(
            results["masked"]["fwdbwd_ms"] / results["plain"]["fwdbwd_ms"]
            - 1, 4),
    }
    return out


# ---------------------------------------------------------------------------
# (c) gram / distillation loss block at the real GCC tap shapes
# ---------------------------------------------------------------------------

def _tap_shapes(batch, size=256, tngf=64, tndf=128):
    """Real distillation tap shapes of the pix2pix GCC config, obtained from
    the actual modules' sown intermediates (not hand-listed)."""
    from gcc_tpu.models.generators import UnetGenerator
    from gcc_tpu.models.discriminators import PatchGAN

    key = jax.random.PRNGKey(0)
    g = UnetGenerator(ngf=tngf, num_downs=8)
    xg = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.bfloat16)
    gv = jax.eval_shape(
        lambda k: g.init({"params": k, "dropout": k},
                         jnp.zeros((1, size, size, 3))), key)
    _, ginter = jax.eval_shape(
        lambda v, x: g.apply(v, x, train=True, mutable=["intermediates"],
                             rngs={"dropout": jax.random.PRNGKey(1)}),
        gv, xg)

    d = PatchGAN(ndf=tndf, norm="batch")
    xd = jax.ShapeDtypeStruct((batch, size, size, 6), jnp.bfloat16)
    dv = jax.eval_shape(lambda k: d.init(k, jnp.zeros((1, size, size, 6))),
                        key)
    _, dinter = jax.eval_shape(
        lambda v, x: d.apply(v, x, train=True,
                             mutable=["intermediates", "batch_stats"]),
        dv, xd)

    shapes = []
    for tree in (ginter["intermediates"], dinter[1]["intermediates"]
                 if isinstance(dinter, tuple) else dinter["intermediates"]):
        for name in sorted(tree):
            leaf = jax.tree_util.tree_leaves(tree[name])[0]
            shapes.append((name, tuple(leaf.shape)))
    return shapes


def evidence_gram(batch=128, size=256):
    from gcc_tpu.engines.common import distill_losses

    shapes = _tap_shapes(batch, size)
    rng = np.random.RandomState(3)
    feats = [jnp.asarray(rng.rand(*s) - 0.5, jnp.bfloat16)
             for _, s in shapes]
    targets = [jnp.asarray(rng.rand(*s) - 0.5, jnp.bfloat16)
               for _, s in shapes]

    lam_c, lam_g = 50.0, 1e4  # pix2pix GCC weights (scripts/pix2pix/train.sh)

    def block(feats, targets):
        # forward + grad to student feats, as in backward_G
        def loss(feats):
            c, g = distill_losses(feats, targets, use_sqrt=True)
            return lam_c * c + lam_g * g
        return jax.grad(loss)(feats)

    jb = jax.jit(block)
    flops, bytes_ = _cost(jb.lower(feats, targets))
    t = _time(jb, feats, targets)

    ideal_bytes = sum(f.nbytes + g.nbytes for f, g in zip(feats, targets))
    # ideal fused pass: read each f and t once (content + gram share the
    # read), write grad-f once
    ideal_bytes += sum(f.nbytes for f in feats)

    # Amdahl share of the full cooperative step (headline bench artifact)
    step = None
    try:
        with open(_BENCH_JSON) as f:
            b = json.load(f)
        step_s = b["value"] and 128 / b["value"]  # batch/ (img/s/chip)
        step = {"imgs_per_sec_chip": b["value"],
                "step_seconds_batch128": round(step_s, 4),
                "distill_block_share": round(t / step_s, 4)}
    except (OSError, KeyError, ValueError):
        pass

    return {
        "tap_shapes": [{"name": n, "shape": list(s)} for n, s in shapes],
        "block_ms": round(t * 1e3, 3),
        "flops": flops,
        "bytes_accessed": bytes_,
        "achieved_GBps": round(bytes_ / t / 1e9, 1),
        "pct_of_hbm_roofline": round(bytes_ / V5E_HBM_GBPS / 1e9 / t, 4),
        "ideal_fused_bytes": ideal_bytes,
        "xla_bytes_over_ideal": round(bytes_ / ideal_bytes, 3),
        "vs_full_step": step,
    }


def main():
    backend = jax.default_backend()
    out = {
        "backend": backend,
        "note": ("Settles SURVEY §2.1 targets (b) and (c); see module "
                 "docstring for the claims under test. (a) and (d) are "
                 "settled in fused_block_result.json / round-2 flash-attn "
                 "benchmarks."),
        "masked_conv": evidence_masked_conv(),
        "gram_distill": evidence_gram(),
    }
    with open(_OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
