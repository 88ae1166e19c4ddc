"""Precompute real-image InceptionV3 statistics for FID
(metric/get_real_stat.py:13-89): runs the dataset's real side through the
FID InceptionV3 and saves mu/sigma to real_stat_<side>.npz.
"""

from __future__ import annotations

import os

import numpy as np


def main(argv=None) -> int:
    from gcc_tpu import config as config_mod
    from gcc_tpu.data import create_dataset
    from gcc_tpu.metrics.fid import activation_statistics
    from gcc_tpu.metrics.inception import InceptionExtractor

    cfg = config_mod.parse(argv)
    if not cfg.inception_path or not os.path.exists(cfg.inception_path):
        raise FileNotFoundError(
            "--inception_path must point to ported FID InceptionV3 weights "
            "(see gcc_tpu/metrics/inception.py for the porting recipe)")
    extractor = InceptionExtractor.get(cfg.inception_path)

    loader = create_dataset(cfg.replace(batch_size=cfg.batch_size,
                                        serial_batches=True, no_flip=True),
                            seed=0)
    side = "B" if cfg.direction == "AtoB" else "A"
    key = {"aligned": side, "unaligned": side,
           "sa": "real_img", "sr": "hr",
           "synthetic": "B"}[cfg.dataset_mode]
    acts = []
    for batch in loader:
        acts.append(extractor.activations(np.asarray(batch[key])))
    mu, sigma = activation_statistics(np.concatenate(acts))
    out = os.path.join(cfg.dataroot, f"real_stat_{side}.npz")
    np.savez(out, mu=mu, sigma=sigma)
    print(f"saved {out} ({len(np.concatenate(acts))} images)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
