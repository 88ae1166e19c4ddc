"""Offline dataset packer: decode once, stream forever.

    python -m gcc_tpu.cli.prepare --dataroot database/cityscapes \\
        --dataset_mode aligned --phase train [--load_size 256] \\
        [--pack_output database/cityscapes_packed]

Runs the deterministic transform prefix (decode + resize / center-crop)
over every image of --dataroot/--phase once and writes a packed root of
mmap-able uint8 blobs (gcc_tpu/data/packed.py). Point --dataroot of
cli.train / cli.test at the packed root afterwards — it is auto-detected
and streams batches with ZERO image decode, which is what lets a
few-core host feed a TPU at device rate (the reference's num_workers
DataLoader re-decodes every JPEG every epoch, data/__init__.py:61-91).

Pack each phase you need (train / val / test / Set5 ...) into the same
output dir; the metadata merges. Per-model presets apply exactly as in
cli.train, so the packed load_size/preprocess match what training uses.
"""

from __future__ import annotations


def main(argv=None) -> int:
    from gcc_tpu import config as config_mod
    from gcc_tpu.data.packed import pack_dataset

    cfg = config_mod.parse(argv)
    out = pack_dataset(cfg, out_dir=cfg.pack_output or None,
                       num_threads=cfg.num_threads)
    print(f"packed root ready: {out}\n"
          f"use it with: python -m gcc_tpu.cli.train --dataroot {out} ...")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
