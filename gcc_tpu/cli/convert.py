"""Convert checkpoints between the reference (torch) and GCC-TPU formats.

Forward (default): brings trained reference models across — generators and
discriminators port layer-for-layer (gcc_tpu.utils.torch_port); the `cfg`
pruned-architecture tuple is carried over so the rebuilt topology matches.

Reverse (--reverse): exports a GCC-TPU checkpoint back to the reference's
.pth container (gcc_tpu.utils.torch_export), so models trained here can be
evaluated/served with the reference's own tooling.

Usage:
  python -m gcc_tpu.cli.convert --model pix2pix \
      --pretrain_path /path/model_best_BtoA.pth --output converted.ckpt
  python -m gcc_tpu.cli.convert --model pix2pix --reverse \
      --pretrain_path experiments/run/checkpoints/model_best_BtoA.ckpt \
      --output model_best_BtoA.pth
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
    p.add_argument("--model", required=True)
    p.add_argument("--pretrain_path", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num_downs", type=int, default=8)
    p.add_argument("--n_blocks", type=int, default=9)
    p.add_argument("--reverse", action="store_true",
                   help="export a GCC-TPU ckpt to the reference .pth format")
    a = p.parse_args(argv)
    fn = convert_reverse if a.reverse else convert
    fn(a.model, a.pretrain_path, a.output, a.num_downs, a.n_blocks)
    print(f"converted {a.pretrain_path} -> {a.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
