"""Input-pipeline throughput: can the host feed the train step?

The compiled pix2pix GCC step consumes ~209 images/sec/chip (bench.py), so
the data layer must decode+transform at least that fast per chip or real
training becomes host-bound. This measures the Loader end-to-end on real
JPEG decode + the reference transform chain (resize 286 -> crop 256 ->
flip -> normalize), sweeping worker threads, with the PIL path and the C++
native engine (--native). Prints one JSON line per configuration.

Run: python benchmarks/data_bench.py [--n 96] [--batch 32] [--threads 1,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int, w: int = 512, h: int = 256) -> None:
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        low = rng.rand(16, 32, 3)
        img = Image.fromarray((low * 255).astype(np.uint8)).resize(
            (w, h), Image.BICUBIC)
        img.save(os.path.join(root, "train", f"{i:04d}.jpg"), quality=92)


def measure(cfg, epochs: int = 3) -> float:
    from gcc_tpu.data import create_dataset
    loader = create_dataset(cfg, seed=0)
    # warm epoch (page cache, pool spin-up)
    n = 0
    for b in loader:
        n += b["A"].shape[0]
    t0 = time.perf_counter()
    total = 0
    for _ in range(epochs):
        for b in loader:
            total += b["A"].shape[0]
    dt = time.perf_counter() - t0
    return total / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--threads", default="1,2,4,8")
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    from gcc_tpu.config import Config
    with tempfile.TemporaryDirectory() as root:
        make_jpegs(root, args.n)
        for native in (False, True):
            if native:
                from gcc_tpu import native as native_mod
                if not native_mod.available():
                    print(json.dumps({"native": True,
                                      "skipped": "engine unavailable"}))
                    continue
            for t in [int(x) for x in args.threads.split(",")]:
                cfg = Config(model="pix2pix", dataset_mode="aligned",
                             dataroot=root, phase="train",
                             load_size=286, crop_size=256,
                             batch_size=args.batch, num_threads=t,
                             native_loader=native, serial_batches=False)
                ips = measure(cfg, epochs=args.epochs)
                print(json.dumps({
                    "metric": "input images/sec",
                    "value": round(ips, 1),
                    "threads": t,
                    "native": native,
                    "cpu_count": os.cpu_count(),
                    "note": ("train step consumes ~209 img/s/chip "
                             "(bench.py); host must exceed that per chip"),
                }), flush=True)


if __name__ == "__main__":
    main()
