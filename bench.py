"""Headline benchmark: images/sec/chip for the pix2pix-cityscapes GCC
cooperative train step (BASELINE.json metric).

The benchmarked iteration is the reference's full per-iteration work
(train.py:144-151): teacher fwd+bwd+update, student D update, student G
update with distillation, plus the DARTS arch step on a second batch —
i.e. everything GCC does per image, not just a generator forward.

Baseline grounding (all numbers auditable from the JSON output):
  * tflop_per_step comes from XLA's compiled cost analysis of the exact
    program being timed — not hand arithmetic.
  * torch_cpu_measured_imgs_per_sec is a real measurement of the reference
    cooperative iteration rebuilt from spec (benchmarks/torch_ref.py),
    cached with provenance in benchmarks/torch_ref_result.json.
  * v100_estimated_imgs_per_sec is an EXTRAPOLATION, labeled as such:
    measured tflop_per_image / (15.7 TF/s fp32 peak x 0.35 assumed conv
    utilization). The reference publishes no numbers (BASELINE.md), so a
    V100 anchor cannot be measured; 0.35 is a typical cuDNN fp32 conv
    efficiency and is stated in the output for the reader to re-scale.
  * mfu is measured TF/s over the v5e bf16 peak (197 TF/s/chip).

Usage: python bench.py [--smoke] [--batch N] [--steps N] [--infer]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

V100_FP32_PEAK_TFS = 15.7
V100_ASSUMED_UTILIZATION = 0.35
V5E_BF16_PEAK_TFS = 197.0

_REPO = os.path.dirname(os.path.abspath(__file__))
_TORCH_REF_JSON = os.path.join(_REPO, "benchmarks", "torch_ref_result.json")
_LAST_MEASURED = os.path.join(_REPO, "benchmarks", "bench_last_measured.json")


def _backend_probe(timeout_s: float) -> bool:
    """True iff the device backend can run a COMPUTATION in a fresh
    subprocess (compile + execute + device->host scalar pull).

    The axon TPU tunnel has two distinct failure modes (CLAUDE.md gotchas):
    (a) down at init — jax.devices() HANGS for minutes rather than fail;
    (b) wedged after init — the backend initializes fine but the first
        compile/transfer hangs forever (observed r4: bench printed the
        backend warning then nothing for 570s).
    Probing an actual tiny matmul round-trip in a subprocess with a hard
    timeout catches both, so the bench fails fast and falls back to the
    cached measurement instead of stalling the driver's end-of-round run.
    """
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             ("import jax, jax.numpy as jnp; "
              "x = jnp.ones((256, 256)); "
              "v = float((x @ x)[0, 0]); "
              "assert v == 256.0, v")],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_cached_fallback(reason: str) -> int:
    """Print the last successful measurement, clearly labeled as cached."""
    try:
        with open(_LAST_MEASURED) as f:
            out = json.load(f)
    except (OSError, ValueError):
        print(json.dumps({"metric": "images/sec/chip", "value": None,
                          "unit": "images/sec/chip", "vs_baseline": None,
                          "error": reason}))
        return 1
    out["cached"] = True
    out["cached_reason"] = (
        reason + "; value is the most recent real-chip measurement "
        "(see measured_at_utc), reproducible with `python bench.py` "
        "when the tunnel is healthy")
    print(json.dumps(out))
    return 0


def _torch_cpu_anchor():
    """Measured torch-CPU throughput of the reference iteration, if the
    cached measurement (benchmarks/torch_ref.py) is present."""
    try:
        with open(_TORCH_REF_JSON) as f:
            r = json.load(f)
        return {"imgs_per_sec": round(r["imgs_per_sec"], 4),
                "batch": r["batch"], "size": r["size"],
                "cpu_count": r.get("cpu_count"),
                "torch_version": r.get("torch_version")}
    except (OSError, KeyError, ValueError):
        return None


def _cost_analysis_flops(lowered_compiled) -> float | None:
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


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
    p.add_argument("--probe_timeout", type=float, default=150.0,
                   help="seconds to wait for the device backend on each "
                        "probe attempt before retrying (0 = no probe)")
    p.add_argument("--probe_window", type=float, default=1800.0,
                   help="total seconds to keep re-probing a down/wedged "
                        "backend before emitting the cached fallback "
                        "(live-or-bust: tunnel outages are usually "
                        "transient, so poll rather than give up)")
    p.add_argument("--probe_interval", type=float, default=150.0,
                   help="seconds between probe attempts within the window")
    args = p.parse_args()
    if args.steps < 1:
        p.error("--steps must be >= 1")

    if not args.smoke and args.probe_timeout > 0:
        deadline = time.monotonic() + max(args.probe_window,
                                          args.probe_timeout)
        attempt = 0
        while True:
            attempt += 1
            if _backend_probe(args.probe_timeout):
                break
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                sys.exit(_emit_cached_fallback(
                    "device backend failed to run a tiny matmul round-trip "
                    f"in {attempt} attempts over "
                    f"{args.probe_window:.0f}s (axon TPU tunnel down or "
                    "wedged post-init)"))
            print(f"bench: probe attempt {attempt} failed; retrying for "
                  f"up to {remaining:.0f}s more", file=sys.stderr)
            time.sleep(min(args.probe_interval, max(remaining, 0)))

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
        # batch sweep on v5e: 16 -> 64 ~ +22%; 64 -> 128 ~ +2.8% (203.5 ->
        # 209.1 img/s/chip measured); 256 regresses (197). 128 is the knee.
        batch = args.batch or 128
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

    n_chips = jax.local_device_count()

    if args.infer:
        # serving throughput of the pruned student generator (eval mode)
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
        flops_step = _cost_analysis_flops(fn.lower(v, x).compile())
        y = fn(v, x)
        _ = float(y[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _i in range(args.steps):
            y = fn(v, x)
        _ = float(y[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        ips = batch * args.steps / dt / n_chips
        out = {
            "metric": "inference images/sec/chip",
            "value": round(ips, 3),
            "unit": "images/sec/chip (pruned pix2pix student, eval)",
        }
        if flops_step:
            tflop_img = flops_step / batch / 1e12
            v100_est = (V100_FP32_PEAK_TFS * V100_ASSUMED_UTILIZATION
                        / tflop_img)
            out.update({
                "tflop_per_image": round(tflop_img, 6),
                "measured_tf_per_sec": round(ips * tflop_img * n_chips, 2),
                "mfu_vs_v5e_peak": round(ips * tflop_img / V5E_BF16_PEAK_TFS,
                                         4),
                "vs_baseline": round(ips / v100_est, 3),
                "baseline": {
                    "v100_estimated_imgs_per_sec": round(v100_est, 3),
                    "basis": (f"{V100_FP32_PEAK_TFS} TF/s fp32 peak x "
                              f"{V100_ASSUMED_UTILIZATION} assumed util / "
                              "measured tflop_per_image (extrapolation; "
                              "reference publishes no numbers)"),
                },
            })
        else:
            out["vs_baseline"] = None
        print(json.dumps(out))
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

    # FLOPs of the exact compiled program being timed (jit cache is shared,
    # so this lowering does not recompile)
    flops_step = _cost_analysis_flops(
        eng._jit_combined.lower(state, train_b, val_b, jnp.float32(2e-4),
                                jnp.float32(0.9),
                                jnp.float32(1e-4)).compile())

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

    imgs_per_sec_chip = batch * window / dt / n_chips
    out = {
        "metric": "images/sec/chip",
        "value": round(imgs_per_sec_chip, 3),
        "unit": "images/sec/chip (pix2pix-cityscapes GCC cooperative step)",
    }
    anchor = _torch_cpu_anchor()
    if anchor and anchor.get("size") != size:
        anchor = None  # only compare at identical shapes
    if flops_step:
        tflop_img = flops_step / batch / 1e12
        measured_tfs = imgs_per_sec_chip * tflop_img
        v100_est = V100_FP32_PEAK_TFS * V100_ASSUMED_UTILIZATION / tflop_img
        out.update({
            "tflop_per_step": round(flops_step / 1e12, 4),
            "tflop_per_image": round(tflop_img, 4),
            "measured_tf_per_sec_chip": round(measured_tfs, 2),
            "mfu_vs_v5e_peak": round(measured_tfs / V5E_BF16_PEAK_TFS, 4),
            "vs_baseline": round(imgs_per_sec_chip / v100_est, 3),
            "baseline": {
                "v100_estimated_imgs_per_sec": round(v100_est, 3),
                "basis": (f"{V100_FP32_PEAK_TFS} TF/s fp32 peak x "
                          f"{V100_ASSUMED_UTILIZATION} assumed util / "
                          "measured tflop_per_image (extrapolation; the "
                          "reference publishes no benchmark numbers)"),
                "torch_cpu_measured": anchor,
            },
        })
        if anchor:
            out["vs_torch_cpu_measured"] = round(
                imgs_per_sec_chip / anchor["imgs_per_sec"], 1)
    else:
        # no cost analysis available on this backend: fall back to the
        # measured torch anchor alone, else report throughput only
        out["vs_baseline"] = (round(imgs_per_sec_chip
                                    / anchor["imgs_per_sec"], 1)
                              if anchor else None)
        out["baseline"] = {"torch_cpu_measured": anchor}
    if not args.smoke and jax.default_backend() != "cpu":
        # refresh the cached measurement the tunnel-down fallback serves
        try:
            with open(_LAST_MEASURED, "w") as f:
                json.dump({**out, "measured_at_utc": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}, f, indent=1)
        except OSError:
            pass
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
