"""Convert checkpoints between the reference (torch) and GCC-TPU formats.

Forward (default): brings trained reference models across — generators and
discriminators port layer-for-layer (gcc_tpu.utils.torch_port); the `cfg`
pruned-architecture tuple is carried over so the rebuilt topology matches.

Reverse (--reverse): exports a GCC-TPU checkpoint back to the reference's
.pth container (gcc_tpu.utils.torch_export), so models trained here can be
evaluated/served with the reference's own tooling.

Evaluator ingestion (--evaluator): validates a user-supplied pretrained
evaluator .pth (TF-FID InceptionV3 / DRN-D-105 / torchvision VGG19 — the
weights the no-egress environment cannot download), runs the forward-parity
self-check against the from-spec torch oracle, and emits the native .npz
for --inception_path/--drn_path/--vgg_path (gcc_tpu.metrics.ingest).

Usage:
  python -m gcc_tpu.cli.convert --model pix2pix \
      --pretrain_path /path/model_best_BtoA.pth --output converted.ckpt
  python -m gcc_tpu.cli.convert --model pix2pix --reverse \
      --pretrain_path experiments/run/checkpoints/model_best_BtoA.ckpt \
      --output model_best_BtoA.pth
  python -m gcc_tpu.cli.convert --evaluator inception \
      --pretrain_path pt_inception-2015-12-05-6726825d.pth \
      --output inception.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(model: str, in_path: str, out_path: str,
            num_downs: int = 8, n_blocks: int = 9) -> dict:
    import torch
    from gcc_tpu.utils import torch_port as tp
    from gcc_tpu.utils.checkpoint import save_checkpoint

    ckpt = torch.load(in_path, map_location="cpu")
    cfg = ckpt.get("cfg", (None, None))
    metric = ckpt.get("fid", ckpt.get("psnr"))
    epoch = ckpt.get("epoch")

    def sd(key):
        return {k: v for k, v in ckpt[key].items()}

    out = {"epoch": epoch, "cfg": cfg, "fid": metric}
    if "pix2pix" in model:
        params, stats = tp.port_unet_generator(sd("G"), num_downs)
        out["G"] = {"params": params, "batch_stats": stats}
        if "D" in ckpt:
            masked = any("alpha" in k for k in ckpt["D"])
            p, s, arch = tp.port_patchgan(sd("D"), masked=masked)
            out["D"] = {"params": p, "batch_stats": s}
            if arch:
                out["D"]["arch"] = arch
    elif "cyclegan" in model:
        out["G_A"] = {"params": tp.port_mobile_resnet(sd("G_A"), n_blocks)}
        out["G_B"] = {"params": tp.port_mobile_resnet(sd("G_B"), n_blocks)}
        for side in ("A", "B"):
            key = f"D_{side}"
            if key in ckpt:
                masked = any("alpha" in k for k in ckpt[key])
                p, s, arch = tp.port_patchgan(sd(key), masked=masked)
                out[key] = {"params": p}
                if s:
                    out[key]["batch_stats"] = s
                if arch:
                    out[key]["arch"] = arch
    elif model == "sagan":
        p, s, spec = tp.port_sagan_generator(sd("G"))
        out["G"] = {"params": p, "batch_stats": s, "spectral": spec}
        if "D" in ckpt:
            masked = any("alpha" in k for k in ckpt["D"])
            p, spec, arch = tp.port_sagan_discriminator(sd("D"), masked)
            out["D"] = {"params": p, "spectral": spec}
            if arch:
                out["D"]["arch"] = arch
    elif model == "srgan":
        p, s = tp.port_srresnet(sd("G"))
        out["G"] = {"params": p, "batch_stats": s}
    else:
        raise NotImplementedError(model)
    save_checkpoint(out_path, out)
    return out


def convert_reverse(model: str, in_path: str, out_path: str,
                    num_downs: int = 8, n_blocks: int = 9) -> dict:
    from gcc_tpu.utils.checkpoint import load_checkpoint
    from gcc_tpu.utils.torch_export import export_checkpoint
    return export_checkpoint(model, load_checkpoint(in_path), out_path,
                             num_downs=num_downs, n_blocks=n_blocks)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--pretrain_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num_downs", type=int, default=8)
    p.add_argument("--n_blocks", type=int, default=9)
    p.add_argument("--reverse", action="store_true",
                   help="export a GCC-TPU ckpt to the reference .pth format")
    p.add_argument("--evaluator", default=None,
                   choices=["inception", "drn", "vgg"],
                   help="ingest a pretrained evaluator .pth: validate keys/"
                        "shapes, self-check forward parity, emit native .npz")
    p.add_argument("--drn_layers", default=None,
                   help="comma DRN layer counts (default 1,1,3,4,23,3,1,1)")
    p.add_argument("--no_parity_check", action="store_true",
                   help="skip the torch-oracle forward self-check")
    a = p.parse_args(argv)
    if a.evaluator:
        import json
        from gcc_tpu.metrics.ingest import ingest_evaluator
        layers = ([int(v) for v in a.drn_layers.split(",")]
                  if a.drn_layers else None)
        report = ingest_evaluator(a.evaluator, a.pretrain_path, a.output,
                                  layers=layers,
                                  parity=not a.no_parity_check)
        print(json.dumps(report))
        return 0
    if not a.model:
        p.error("--model is required (unless --evaluator is used)")
    fn = convert_reverse if a.reverse else convert
    fn(a.model, a.pretrain_path, a.output, a.num_downs, a.n_blocks)
    print(f"converted {a.pretrain_path} -> {a.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
