"""Epoch-end evaluation orchestrators (metric/test_metric.py:15-204).

Protocol quirks preserved: eval batches are bs=1, serial, no flip, fixed
load_size (test_metric.py:16-21 etc.); SAGAN evaluates on 10% of the dataset
(l.144); SRGAN reports PSNR/SSIM per test set on the Y channel; cyclegan
reports FID per direction.

FID requires InceptionV3 weights (--inception_path) and real statistics
(real_stat npz next to the dataroot, metric/get_real_stat.py); mIoU requires
DRN-D-105 weights (--drn_path). When an evaluator's weights are absent the
orchestrator falls back to **pixel-FID** — the same Frechet distance on
8x8-downsampled pixel statistics — or PSNR for paired tasks, and logs loudly
that it is a proxy. PSNR/SSIM (SRGAN) need no external weights and are exact.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np

from gcc_tpu.metrics.fid import (activation_statistics, fid_from_activations,
                                 frechet_distance)
from gcc_tpu.metrics.psnr_ssim import psnr_y, ssim_y


def eval_cfg(cfg, **overrides):
    # --eval_batch >1 batches the generator forwards; outputs are the
    # bs=1 protocol's (eval mode: no dropout, running BN stats, per-sample
    # IN), order and ntest cap preserved (_collect trims the final batch)
    base = dict(batch_size=max(1, int(getattr(cfg, "eval_batch", 1))),
                serial_batches=True, no_flip=True,
                phase="val" if cfg.dataset_mode != "synthetic" else cfg.phase)
    base.update(overrides)
    try:
        return cfg.replace(**base)
    except TypeError:
        return dataclasses.replace(cfg, **base)


def _pixel_features(images: np.ndarray) -> np.ndarray:
    """8x8x3 average-pooled pixel features for the proxy Frechet distance."""
    from PIL import Image
    feats = []
    for im in images:
        arr = ((np.asarray(im) + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        small = np.asarray(Image.fromarray(arr).resize((8, 8), Image.BILINEAR),
                           np.float64) / 255.0
        feats.append(small.ravel())
    return np.stack(feats)


def pixel_fid(fakes: np.ndarray, reals: np.ndarray) -> float:
    mu1, s1 = activation_statistics(_pixel_features(fakes))
    mu2, s2 = activation_statistics(_pixel_features(reals))
    return frechet_distance(mu1, s1, mu2, s2)


def _inception_acts(cfg, images: np.ndarray) -> Optional[np.ndarray]:
    if not cfg.inception_path or not os.path.exists(cfg.inception_path):
        return None
    from gcc_tpu.metrics.inception import InceptionExtractor
    return InceptionExtractor.get(cfg.inception_path).activations(images)


def _real_stat_path(cfg) -> str:
    direction = "B" if cfg.direction == "AtoB" else "A"
    return os.path.join(cfg.dataroot, f"real_stat_{direction}.npz")


def _collect(cfg, engine, state, loader, key_in: str, key_out: str,
             max_items: Optional[int] = None, direction: str = "AtoB",
             teacher: bool = False):
    """Run the generator over a loader in eval mode; host numpy outputs."""
    import jax.numpy as jnp
    fakes, reals, inputs = [], [], []
    n = 0
    # --spatial_shards: rows shard across devices (parallel/spatial.py);
    # shard count auto-reduces per image height. z-input SAGAN excluded.
    sp = max(1, int(getattr(cfg, "spatial_shards", 1)))
    use_sp = sp > 1 and cfg.model != "sagan"
    for batch in loader:
        x = jnp.asarray(batch[key_in])
        if "cyclegan" in cfg.model:
            gen = engine.generate_spatial if use_sp else engine.generate
            kw = {"n_spatial": sp} if use_sp else {}
            fake = gen(state, x, direction=direction, teacher=teacher, **kw)
        elif use_sp:
            fake = engine.generate_spatial(state, x, n_spatial=sp,
                                           teacher=teacher)
        else:
            fake = engine.generate(state, x, teacher=teacher)
        fakes.append(np.asarray(fake, np.float32))
        if key_out in batch:
            reals.append(np.asarray(batch[key_out], np.float32))
        inputs.append(np.asarray(batch[key_in], np.float32))
        n += x.shape[0]
        if max_items is not None and n >= max_items:
            break
    # trim to the cap: with --eval_batch >1 the last batch can overshoot
    m = max_items if max_items is not None else n
    return (np.concatenate(fakes)[:m],
            np.concatenate(reals)[:m] if reals else None,
            np.concatenate(inputs)[:m])


def evaluate_engine(cfg, engine, state, logger, epoch):
    if "pix2pix" in cfg.model:
        return _eval_pix2pix(cfg, engine, state, logger)
    if cfg.model == "srgan":
        return _eval_srgan(cfg, engine, state, logger)
    if cfg.model == "sagan":
        return _eval_sagan(cfg, engine, state, logger)
    if "cyclegan" in cfg.model:
        return _eval_cyclegan(cfg, engine, state, logger)
    raise NotImplementedError(cfg.model)


def _make_loader(cfg, seed=1234, **kw):
    from gcc_tpu.data import create_dataset
    return create_dataset(eval_cfg(cfg, **kw), seed=seed)


def _eval_pix2pix(cfg, engine, state, logger):
    ecfg = eval_cfg(cfg, load_size=256)
    loader = _make_loader(ecfg)
    # direction swap as in set_input
    key_in, key_out = ("B", "A") if cfg.direction == "BtoA" else ("A", "B")
    cap = None if cfg.ntest == float("inf") else int(cfg.ntest)
    fakes, reals, _ = _collect(ecfg, engine, state, loader, key_in, key_out,
                               max_items=cap)
    if "cityscapes" in cfg.dataroot and cfg.drn_path \
            and os.path.exists(cfg.drn_path):
        from gcc_tpu.metrics.miou import compute_miou
        miou = compute_miou(cfg, fakes, loader.dataset)
        logger.info(f"mIoU: {miou:.2f}")
        return miou
    acts = _inception_acts(cfg, fakes)
    stat = _real_stat_path(cfg)
    if acts is not None and os.path.exists(stat):
        npz = np.load(stat)
        fid = fid_from_activations(acts, npz["mu"], npz["sigma"])
        logger.info(f"FID: {fid:.2f}")
        return fid
    if "cityscapes" in cfg.dataroot:
        # maximize-direction proxy when DRN weights are absent
        p = float(np.mean([psnr_y(f, r) for f, r in zip(fakes, reals)]))
        logger.info(f"[proxy] PSNR (no DRN weights at drn_path): {p:.2f}")
        return p
    fid = pixel_fid(fakes, reals)
    logger.info(f"[proxy] pixel-FID (no inception weights): {fid:.4f}")
    return fid


def _eval_srgan(cfg, engine, state, logger) -> Dict[str, float]:
    from gcc_tpu.data.datasets import SyntheticDataset
    from gcc_tpu.data.packed import PACK_META, is_packed_root
    results: Dict[str, float] = {}
    test_sets = ["Set5", "Set14", "B100", "Urban100"]
    if is_packed_root(cfg.dataroot):
        import json
        with open(os.path.join(cfg.dataroot, PACK_META)) as f:
            packed_phases = json.load(f).get("phases", {})
        available = [t for t in test_sets if t in packed_phases]
    else:
        available = [t for t in test_sets if cfg.dataroot
                     and os.path.isdir(os.path.join(cfg.dataroot, t))]
    if not available:
        available = ["val"]
    for name in available:
        if cfg.dataset_mode == "synthetic":
            ds = SyntheticDataset(eval_cfg(cfg), seed=999, length=8)
        else:
            from gcc_tpu.data import build_dataset
            ds = build_dataset(eval_cfg(cfg), seed=0,
                               test_data_name=None if name == "val" else name)
        psnrs, ssims = [], []
        for i in range(len(ds)):
            item = ds[i]
            import jax.numpy as jnp
            fake = np.asarray(engine.generate(
                state, jnp.asarray(item["lr"])[None]))[0]
            psnrs.append(psnr_y(fake, item["hr"]))
            ssims.append(ssim_y(fake, item["hr"]))
        results[f"{name}_psnr"] = float(np.mean(psnrs))
        results[f"{name}_ssim"] = float(np.mean(ssims))
        logger.info(f"{name}: PSNR: {results[f'{name}_psnr']:.2f} | "
                    f"SSIM: {results[f'{name}_ssim']:.4f}")
    return results


def _eval_sagan(cfg, engine, state, logger):
    ecfg = eval_cfg(cfg, load_size=64)
    loader = _make_loader(ecfg)
    n_eval = max(1, int(0.1 * len(loader.dataset)))  # 10% (test_metric.py:144)
    fakes, reals, _ = _collect(ecfg, engine, state, loader, "z", "real_img",
                               max_items=n_eval)
    acts = _inception_acts(cfg, fakes)
    stat = _real_stat_path(cfg)
    if acts is not None and os.path.exists(stat):
        npz = np.load(stat)
        fid = fid_from_activations(acts, npz["mu"], npz["sigma"])
        logger.info(f"FID: {fid:.2f}")
        return fid
    fid = pixel_fid(fakes, reals)
    logger.info(f"[proxy] pixel-FID (no inception weights): {fid:.4f}")
    return fid


def _eval_cyclegan(cfg, engine, state, logger) -> Dict[str, float]:
    ecfg = eval_cfg(cfg, load_size=256)
    loader = _make_loader(ecfg)
    cap = None if cfg.ntest == float("inf") else int(cfg.ntest)
    fakes_B, reals_B, _ = _collect(ecfg, engine, state, loader, "A", "B",
                                   max_items=cap, direction="AtoB")
    fakes_A, reals_A, _ = _collect(ecfg, engine, state, loader, "B", "A",
                                   max_items=cap, direction="BtoA")
    out = {}
    for direction, fakes, reals in (("AtoB", fakes_B, reals_B),
                                    ("BtoA", fakes_A, reals_A)):
        acts = _inception_acts(cfg, fakes)
        stat = os.path.join(cfg.dataroot,
                            f"real_stat_{direction[-1]}.npz")
        if acts is not None and os.path.exists(stat):
            npz = np.load(stat)
            out[direction] = fid_from_activations(acts, npz["mu"],
                                                  npz["sigma"])
            logger.info(f"{direction} FID: {out[direction]:.2f}")
        else:
            out[direction] = pixel_fid(fakes, reals)
            logger.info(f"[proxy] {direction} pixel-FID: "
                        f"{out[direction]:.4f}")
    return out
