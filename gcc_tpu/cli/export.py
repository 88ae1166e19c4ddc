"""Serving-export entry point — beyond the reference (its only deployment
path is torch-loading the .pth, reference test.py:131-163).

Loads a GCC-TPU checkpoint, rebuilds the pruned generator from the `cfg`
tuple stored in it (the pruned topology IS data, reference test.py:140-141),
and serializes it as a self-contained StableHLO artifact via jax.export:
weights baked in, symbolic batch dimension, multi-platform (cpu+tpu by
default). The artifact is callable WITHOUT gcc_tpu/flax/the checkpoint:

    from jax import export
    g = export.deserialize(bytearray(open(p, 'rb').read()))
    fake = g.call(x)        # any batch size

Usage (same model/size flags as cli.test, plus export knobs):
  python -m gcc_tpu.cli.export --model pix2pix --dataroot unused \
      --pretrain_path experiments/run/checkpoints/model_best.ckpt \
      --name run [--serve_dtype bfloat16] [--static_batch 8] \
      [--platforms cpu,tpu] [--output_dir DIR]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ep = argparse.ArgumentParser(add_help=False)
    ep.add_argument("--output_dir", default=None,
                    help="artifact dir (default <run_dir>/serving)")
    ep.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ep.add_argument("--static_batch", type=int, default=0,
                    help="fix the batch dim (default 0 = symbolic batch)")
    ep.add_argument("--serve_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="weights+input dtype baked into the artifact")
    ep.add_argument("--quantize", default="none", choices=("none", "int8"),
                    help="int8: per-output-channel weight-only quantization"
                         " — int8 kernels + scales baked into the artifact,"
                         " dequantized to serve_dtype inside the function"
                         " (~4x smaller file, ~64 dB PSNR vs f32)")
    ea, rest = ep.parse_known_args(argv)

    import jax
    import jax.numpy as jnp
    from gcc_tpu import config as config_mod
    from gcc_tpu.cli.test import rebuild_engine
    from gcc_tpu.utils import hlo_export as hx
    from gcc_tpu.utils.checkpoint import load_checkpoint
    from gcc_tpu.utils.logging import get_logger

    cfg = config_mod.parse(rest).replace(isTrain=False)
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    logger = get_logger(os.path.join(run_dir, "logger.log"))

    if not cfg.pretrain_path or not os.path.exists(cfg.pretrain_path):
        raise FileNotFoundError("pretrain model path must exist")
    ckpt = load_checkpoint(cfg.pretrain_path)
    engine = rebuild_engine(cfg, ckpt)
    state = engine.init_state(jax.random.PRNGKey(cfg.seed))
    state = engine.load_net_params(state, ckpt, load_discriminator=False)

    out_dir = ea.output_dir or os.path.join(run_dir, "serving")
    os.makedirs(out_dir, exist_ok=True)
    platforms = tuple(p.strip() for p in ea.platforms.split(",") if p.strip())
    dtype = jnp.bfloat16 if ea.serve_dtype == "bfloat16" else jnp.float32
    shape = hx.example_input_shape(cfg)
    if ea.static_batch > 0:
        shape = (ea.static_batch,) + shape[1:]

    directions = ("AtoB", "BtoA") if "cyclegan" in cfg.model else (None,)
    written = []
    for d in directions:
        exp = hx.export_generator(
            engine, state, shape, direction=d or "AtoB",
            platforms=platforms, poly_batch=ea.static_batch <= 0,
            dtype=dtype,
            weight_quant=None if ea.quantize == "none" else ea.quantize)
        tag = f"_{d}" if d else ""
        if ea.quantize != "none":
            tag += f"_{ea.quantize}"
        path = os.path.join(out_dir, f"{cfg.model}_G{tag}.stablehlo")
        size = hx.save_exported(exp, path)
        logger.info(f"exported {path} ({size/1e6:.2f} MB, "
                    f"quantize={ea.quantize}, "
                    f"platforms={platforms}, dtype={ea.serve_dtype}, "
                    f"batch={'symbolic' if ea.static_batch <= 0 else ea.static_batch}, "
                    f"input={tuple(shape[1:])})")
        written.append(path)
    print("\n".join(written))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
