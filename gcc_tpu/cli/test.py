"""Evaluation entry point — reference test.py:131-163.

Loads a checkpoint, rebuilds the pruned architecture from the `cfg` stored
inside it (the pruned topology IS data, test.py:140-141), runs the generator
over the eval dataset, dumps images to experiments/<name>/test_results and
reports metrics via the eval orchestrators.
"""

from __future__ import annotations

import os

import numpy as np


def dump_cap(cfg):
    """Image-dump cap for the test loop.

    `--ntest N` wins when given; with the default ntest=inf, SAGAN caps at
    1000 images (reference test.py:51 `if i == 1000: break`) and the other
    families dump the whole eval set (reference test.py:27-28 keeps its cap
    commented out).
    """
    if cfg.ntest != float("inf"):
        return int(cfg.ntest)
    return 1000 if cfg.model == "sagan" else None


def rebuild_engine(cfg, ckpt):
    from gcc_tpu.models import get_engine_class
    from gcc_tpu.utils.checkpoint import restore_cfg
    filter_cfgs, channel_cfgs = restore_cfg(ckpt)
    cls = get_engine_class(cfg.model)
    if "cyclegan" in cfg.model:
        return cls(cfg, cfg_AtoB=filter_cfgs, cfg_BtoA=channel_cfgs)
    if cfg.model in ("sagan", "srgan"):
        return cls(cfg, filter_cfgs=filter_cfgs)
    return cls(cfg, filter_cfgs=filter_cfgs, channel_cfgs=channel_cfgs)


def main(argv=None) -> int:
    import jax
    from gcc_tpu import config as config_mod
    from gcc_tpu.data import create_dataset
    from gcc_tpu.eval.orchestrators import evaluate_engine
    from gcc_tpu.utils.checkpoint import load_checkpoint
    from gcc_tpu.utils.image import save_images
    from gcc_tpu.utils.logging import get_logger

    cfg = config_mod.parse(argv)
    cfg = cfg.replace(isTrain=False)
    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    logger = get_logger(os.path.join(run_dir, "logger.log"))

    from gcc_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache(cfg, logger)

    if not cfg.pretrain_path or not os.path.exists(cfg.pretrain_path):
        raise FileNotFoundError("pretrain model path must exist")
    ckpt = load_checkpoint(cfg.pretrain_path)
    engine = rebuild_engine(cfg, ckpt)
    state = engine.init_state(jax.random.PRNGKey(cfg.seed))
    state = engine.load_net_params(state, ckpt, load_discriminator=False)
    logger.info(f"loaded the model from {cfg.pretrain_path}")

    # dump images (test.py:25-58)
    import jax.numpy as jnp

    sp = max(1, int(cfg.spatial_shards))
    if sp > 1 and cfg.model == "sagan":
        logger.warning("--spatial_shards ignored: SAGAN's z input has no "
                       "spatial axis")
    elif sp > 1:
        logger.info(f"spatial partitioning: image rows sharded up to "
                    f"{sp}-way (auto-reduced per image height)")

    def gen(x, **kw):
        # image-input generators can shard H across devices (SP); z-input
        # SAGAN has no spatial axis on its input
        if sp > 1 and cfg.model != "sagan":
            return engine.generate_spatial(state, x, n_spatial=sp, **kw)
        return engine.generate(state, x, **kw)

    result_dir = os.path.join(run_dir, "test_results")
    loader = create_dataset(cfg.replace(batch_size=1, serial_batches=True,
                                        no_flip=True), seed=0)
    n = 0
    cap = dump_cap(cfg)
    for batch in loader:
        # visual sets mirror get_current_visuals (Pix2Pix.py:686-692 etc.)
        if "pix2pix" in cfg.model:
            kin, kout = ("B", "A") if cfg.direction == "BtoA" else ("A", "B")
            fake = gen(jnp.asarray(batch[kin]))
            visuals = {"real_A": batch[kin], "fake_B": np.asarray(fake),
                       "real_B": batch[kout]}
            name = os.path.basename(batch["A_paths"][0])
        elif cfg.model == "sagan":
            fake = engine.generate(state, jnp.asarray(batch["z"]))
            visuals = {"fake_img": np.asarray(fake),
                       "real_img": batch["real_img"]}
            name = batch["img_path"][0]
        elif cfg.model == "srgan":
            fake = gen(jnp.asarray(batch["lr"]))
            visuals = {"fake_hr": np.asarray(fake), "real_hr": batch["hr"]}
            name = batch["hr_names"][0]
        else:  # cyclegan
            A, B = jnp.asarray(batch["A"]), jnp.asarray(batch["B"])
            fake_B = gen(A, direction="AtoB")
            rec_A = gen(fake_B, direction="BtoA")
            fake_A = gen(B, direction="BtoA")
            rec_B = gen(fake_A, direction="AtoB")
            visuals = {"real_A": batch["A"], "fake_B": np.asarray(fake_B),
                       "rec_A": np.asarray(rec_A), "real_B": batch["B"],
                       "fake_A": np.asarray(fake_A),
                       "rec_B": np.asarray(rec_B)}
            name = os.path.basename(batch["A_paths"][0])
        save_images(result_dir, visuals, name,
                    aspect_ratio=cfg.aspect_ratio)
        n += 1
        if cap is not None and n >= cap:
            break
    logger.info(f"dumped {n} results to {result_dir}")

    perf = evaluate_engine(cfg, engine, state, logger, epoch=ckpt.get("epoch"))
    logger.info(f"metrics: {perf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
