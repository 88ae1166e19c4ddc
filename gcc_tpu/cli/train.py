"""Training entry point — the reference train.py workflow (train.py:75-174).

Workflow: parse flags -> build engine (pruning the generator to the MACs
budget first when --scale_prune/--norm_prune) -> loaders -> epoch loop:
per-iteration cooperative train step (teacher+student), optional DARTS arch
step on a val batch, periodic loss logging, epoch-end eval -> best-checkpoint
tracking, sparsity report, LR/ema schedules.

Same flag surface as the reference CLI; see scripts in the reference repo
for the canonical bundles. Additional TPU-native knobs: --mesh_shape,
--compute_dtype, --seed.
"""

from __future__ import annotations

import os
import time
import numpy as np


def build_engine(cfg, logger=None):
    """Engine + pruned cfgs, mirroring train.py:84-91 + prune_util.prune."""
    import jax
    from gcc_tpu import compress
    from gcc_tpu.models import get_engine_class
    from gcc_tpu.utils.checkpoint import load_checkpoint

    log = logger.info if logger else print
    engine_cls = get_engine_class(cfg.model)

    if not (cfg.norm_prune or cfg.scale_prune):
        return engine_cls(cfg)

    if cfg.target_budget is None:
        raise RuntimeError("the target budget must exist")
    if cfg.pretrain_path is None:
        raise RuntimeError("the pretrain path must exist")
    ckpt = load_checkpoint(cfg.pretrain_path)
    tol = compress.prune.tolerance_for(cfg.dataroot)
    mode = "scale" if cfg.scale_prune else "norm"

    if "cyclegan" in cfg.model:
        ga = ckpt["G_A"]["params"]
        gb = ckpt["G_B"]["params"]
        if "horse2zebra" in cfg.dataroot:
            # the reference overrides its own search with these cfgs
            # (utils/prune_util.py:120-121)
            cfg_a, cfg_b = compress.cyclegan_reference_cfgs()
        else:
            cfg_a, _ = compress.prune_mobile_resnet(
                ga, target_budget_g=cfg.target_budget, tolerance_g=0.05,
                image_size=cfg.load_size)
            cfg_b, _ = compress.prune_mobile_resnet(
                gb, target_budget_g=cfg.target_budget_B, tolerance_g=0.05,
                image_size=cfg.load_size)
        log(f"pruned cfg_AtoB: {cfg_a}")
        log(f"pruned cfg_BtoA: {cfg_b}")
        return engine_cls(cfg, cfg_AtoB=cfg_a, cfg_BtoA=cfg_b)

    g_params = ckpt["G"]["params"]
    if "pix2pix" in cfg.model and cfg.backbone == "resnet":
        fc, g = compress.prune.prune_mobile_resnet_union(
            g_params, target_budget_g=cfg.target_budget, tolerance_g=tol,
            image_size=cfg.load_size)
        log(f"pruned filter_cfgs: {fc} ({g:.6f} GMACs)")
        return engine_cls(cfg, filter_cfgs=fc)
    if cfg.model == "sagan":
        fc, g = compress.prune_sagan(g_params,
                                     target_budget_g=cfg.target_budget,
                                     tolerance_g=tol, z_dim=cfg.z_dim,
                                     image_size=cfg.crop_size)
        log(f"pruned filter_cfgs: {fc} ({g:.6f} GMACs)")
        return engine_cls(cfg, filter_cfgs=fc)
    if cfg.model == "srgan":
        fc, g = compress.prune_srresnet(
            g_params, mode=mode, n_channels=cfg.ngf,
            target_budget_g=cfg.target_budget, tolerance_g=tol,
            lr_size=cfg.image_size // cfg.upscale_factor)
        log(f"pruned filter_cfgs: {fc} ({g:.6f} GMACs)")
        return engine_cls(cfg, filter_cfgs=fc)
    # pix2pix (the unprunable stem/innermost widths are the model's ngf,
    # Pix2Pix.py:825-826; the reference's --pretrain_ngf is declared but dead)
    fc, cc, g = compress.prune_unet(
        g_params, mode=mode, ngf=cfg.ngf,
        target_budget_g=cfg.target_budget, tolerance_g=tol,
        num_downs=cfg.num_downs, image_size=cfg.load_size)
    log(f"pruned filter_cfgs: {fc}")
    log(f"pruned channel_cfgs: {cc} ({g:.6f} GMACs)")
    return engine_cls(cfg, filter_cfgs=fc, channel_cfgs=cc)


def set_input(cfg, batch):
    """Direction swap (models/Pix2Pix.py:453-458) + numpy->device dict.

    Packed datasets deliver uint8 (data/packed.py): those keys transfer raw
    (4x fewer host->device bytes) and normalize on device in one fused jit.
    Device-cached loaders (data/device_cache.py) deliver jax arrays already
    normalized on device: those pass straight through."""
    import jax
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    out, u8 = {}, {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            if v.dtype == np.uint8:
                u8[k] = v
            else:
                out[k] = jnp.asarray(v, dtype)
        elif isinstance(v, jax.Array):
            out[k] = v
    if u8:
        from gcc_tpu.data.packed import device_normalize
        out.update(device_normalize(u8, dtype))
    if "A" in out and cfg.direction == "BtoA":
        out["A"], out["B"] = out["B"], out["A"]
    return out


def evaluate(cfg, engine, state, logger, epoch):
    """Epoch-end metric (train.py:14-73). Full FID/mIoU need ported evaluator
    weights (--inception_path / --drn_path); without them a proxy metric is
    reported so best-checkpoint tracking still works."""
    from gcc_tpu.eval.orchestrators import evaluate_engine
    return evaluate_engine(cfg, engine, state, logger, epoch)


def main(argv=None) -> int:
    from gcc_tpu import config as config_mod
    cfg = config_mod.parse(argv)
    return run(cfg)


def run(cfg) -> int:
    import jax
    from gcc_tpu.data import create_split_dataset
    from gcc_tpu.data.loader import InfiniteLoader
    from gcc_tpu.parallel import make_mesh, replicate_state, shard_batch
    from gcc_tpu.utils.best_info import BestInfo
    from gcc_tpu.utils.checkpoint import ckpt_name, save_checkpoint
    from gcc_tpu.utils.logging import JsonlWriter, get_logger
    from gcc_tpu.utils.best_info import maximize_metric
    from gcc_tpu.utils.schedule import Plateau, ema_beta_for_epoch, \
        lr_for_epoch, multiplier_after_steps
    from gcc_tpu.ops.mask import sparsity_report

    run_dir = os.path.join(cfg.checkpoints_dir, cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    logger = get_logger(os.path.join(run_dir, "logger.log"))

    # Graceful preemption: TPU-pod maintenance/preemption sends SIGTERM.
    # Finish the in-flight iteration, persist the FULL train state, and
    # exit 0 so --continue_train restarts the interrupted epoch — nothing
    # is lost beyond the current epoch's partial pass. (The reference has
    # no recovery story at all; its --continue_train is dead,
    # options/options.py:29.) SIGKILL recovery — epoch granularity from
    # the last epoch-end save — is exercised by benchmarks/soak.py.
    # Installed before the engine build so a signal during the (possibly
    # minutes-long) first compile is caught too.
    import signal
    preempt = {"flag": False}
    prev_sigterm = None
    try:
        prev_sigterm = signal.signal(
            signal.SIGTERM, lambda _s, _f: preempt.update(flag=True))
    except ValueError:
        pass  # not the main thread (embedded use); feature unavailable

    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled")

    from gcc_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache(cfg, logger)

    # print_options parity (options/options.py:130-152, disabled there):
    # dump the resolved config into the run dir
    import dataclasses as _dc
    with open(os.path.join(run_dir, "opt.txt"), "w") as f:
        f.write("----------------- Options ---------------\n")
        for fld in _dc.fields(cfg):
            f.write(f"{fld.name}: {getattr(cfg, fld.name)}\n")
        f.write("----------------- End -------------------\n")
    jsonl = JsonlWriter(os.path.join(run_dir, "metrics.jsonl")) \
        if cfg.log_jsonl else None
    best = BestInfo(cfg)

    engine = build_engine(cfg, logger)
    state = engine.init_state(jax.random.PRNGKey(cfg.seed))

    if cfg.initial_path:
        from gcc_tpu.utils.checkpoint import load_checkpoint
        state = engine.load_net_params(state, load_checkpoint(cfg.initial_path),
                                       load_discriminator=False)
        logger.info(f"loaded initial G from {cfg.initial_path}")
    if cfg.teacher_initial_path and engine.distill:
        from gcc_tpu.utils.checkpoint import load_checkpoint
        tck = load_checkpoint(cfg.teacher_initial_path)
        nets = dict(state.nets)
        nets["tg"] = tck["G"]
        state = state.replace(nets=nets)
        logger.info(f"loaded teacher G from {cfg.teacher_initial_path}")
    if cfg.normal_distillation and cfg.distillation_path:
        # frozen-teacher distillation from a fixed checkpoint
        from gcc_tpu.utils.checkpoint import load_checkpoint
        tck = load_checkpoint(cfg.distillation_path)
        nets = dict(state.nets)
        if "cyclegan" in cfg.model:
            nets["tg_a"], nets["tg_b"] = tck["G_A"], tck["G_B"]
            nets["td_a"], nets["td_b"] = tck["D_A"], tck["D_B"]
        else:
            nets["tg"] = tck["G"]
            if tck.get("D") is not None:
                nets["td"] = tck["D"]
        state = state.replace(nets=nets)
        logger.info(f"loaded frozen teacher from {cfg.distillation_path}")

    # true resume (the reference's --continue_train is declared but dead,
    # options/options.py:29): full state incl. optimizer moments + EMA + rng
    import json
    from gcc_tpu.utils.checkpoint import load_state, save_state
    state_path = os.path.join(run_dir, "checkpoints", "train_state.ckpt")
    meta_path = os.path.join(run_dir, "checkpoints", "train_state.json")
    start_epoch = cfg.epoch_count
    if cfg.continue_train and os.path.exists(state_path):
        state = load_state(state_path, state)
        with open(meta_path) as f:
            start_epoch = json.load(f)["epoch"] + 1
        logger.info(f"resumed full train state from {state_path} "
                    f"(continuing at epoch {start_epoch})")

    # data-parallel mesh: as many devices as divide the batch size
    n_dev = len(jax.devices())
    if cfg.mesh_shape:
        n_dev = int(np.prod(cfg.mesh_shape))
    while cfg.batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(n_dev)
    state = replicate_state(state, mesh)

    train_loader, val_loader = create_split_dataset(cfg, seed=cfg.seed,
                                                    mesh=mesh, logger=logger)
    logger.info(f"The number of training images = "
                f"{len(train_loader.dataset)}")
    logger.info(f"mesh: {mesh.shape}")

    # Device-cache fused step: when the loaders are HBM-resident
    # (DeviceCacheLoader), trace their batch materializers INTO the
    # cooperative step — one dispatch + one packed param upload per
    # iteration instead of two materializer dispatches plus the step
    # (data/device_cache.py:FusedCachedStep).
    darts_mode = (cfg.darts_discriminator and engine.distill
                  and not cfg.generator_only)
    from gcc_tpu.data.device_cache import (DeviceCacheLoader,
                                           FusedCachedStep, InfiniteParams)
    fused = None
    if isinstance(train_loader, DeviceCacheLoader) and (
            not darts_mode or isinstance(val_loader, DeviceCacheLoader)):
        fused = FusedCachedStep(engine, train_loader,
                                val_loader if darts_mode else None,
                                swap_ab=cfg.direction == "BtoA")
        logger.info("device_cache: fused materialize+train"
                    + ("+arch" if darts_mode else "")
                    + " step (one dispatch per iteration)")

    total_epochs = cfg.n_epochs + cfg.n_epochs_decay
    total_iters = 0
    current_perf = None
    # HBM guardrail (utils/memory_guard.py): project the compiled step's
    # peak before the first iteration executes. auto skips CPU (compiles
    # there take minutes and host RAM isn't the constraint).
    guard_pending = cfg.memory_guard in ("on", "strict") or (
        cfg.memory_guard == "auto" and jax.default_backend() != "cpu")
    # metric-driven LR (torch ReduceLROnPlateau parity; fed the epoch-end
    # eval metric each save_epoch_freq — negated when the metric maximizes)
    plateau = Plateau(cfg.lr) if cfg.lr_policy == "plateau" else None
    profile_until = None
    if cfg.profile_steps > 0:
        # jax.profiler trace of the first N iterations (SURVEY aux tracing
        # row; replaces the reference's wall-clock-only timing)
        try:
            trace_dir = os.path.join(run_dir, "profile")
            jax.profiler.start_trace(trace_dir)
            profile_until = cfg.profile_steps
            logger.info(f"profiling first {profile_until} iterations "
                        f"-> {trace_dir}")
        except Exception as e:  # tunnel backends may not support tracing
            logger.info(f"profiler unavailable: {e}")
    for epoch in range(start_epoch, total_epochs + 1):
        epoch_start = time.time()
        # epoch-keyed shuffles: resumed runs replay the uninterrupted order
        train_loader.set_epoch(epoch)
        val_loader.set_epoch(epoch)
        # fresh DARTS val iterator each epoch, as the reference does
        # (train.py:131); InfiniteLoader still cycles if val is smaller
        # than train
        val_stream = (InfiniteParams(val_loader)
                      if fused is not None and darts_mode
                      else InfiniteLoader(val_loader))
        lr = plateau.lr if plateau else lr_for_epoch(cfg, epoch)
        ema_beta = ema_beta_for_epoch(cfg, epoch)
        arch_lr = cfg.arch_lr
        if cfg.arch_lr_step and plateau:
            arch_lr = cfg.arch_lr * (plateau.lr / cfg.lr)
        elif cfg.arch_lr_step:
            # reference arch schedulers: sagan step/40 (SAGAN.py:348-353),
            # pix2pix/cyclegan step/(n_epochs-1) (Pix2Pix.py:432-437), srgan
            # reuses the model's own policy (SRGAN.py:370-371, 385)
            if cfg.model == "srgan":
                arch_lr = cfg.arch_lr * multiplier_after_steps(
                    cfg.lr_policy, max(epoch - cfg.epoch_count, 0),
                    n_epochs=cfg.n_epochs, n_epochs_decay=cfg.n_epochs_decay,
                    lr_decay_iters=cfg.lr_decay_iters)
            else:
                decay_iters = 40 if cfg.model == "sagan" else cfg.n_epochs - 1
                arch_lr = cfg.arch_lr * multiplier_after_steps(
                    "step", max(epoch - cfg.epoch_count, 0),
                    lr_decay_iters=decay_iters)

        batch_iter = (train_loader.iter_param_batches()
                      if fused is not None else train_loader)
        for i, data in enumerate(batch_iter):
            iter_start = time.time()
            if fused is not None:
                # device-cache fused path: ship only the packed transform
                # params; materialize+train(+arch) is ONE compiled program
                targs, _ = data
                if darts_mode:
                    vargs, _ = next(val_stream)
                    if guard_pending:
                        guard_pending = False
                        from gcc_tpu.utils.memory_guard import check_step
                        import jax.numpy as jnp
                        check_step(fused.jit,
                                   (state, train_loader._data,
                                    val_loader._data, targs, vargs,
                                    jnp.float32(lr), jnp.float32(ema_beta),
                                    jnp.float32(arch_lr)),
                                   batch_argnums=(3, 4),
                                   batch_size=cfg.batch_size, logger=logger,
                                   strict=cfg.memory_guard == "strict")
                    state, losses = fused.train_arch_step(
                        state, targs, vargs, lr, ema_beta, arch_lr)
                else:
                    if guard_pending:
                        guard_pending = False
                        from gcc_tpu.utils.memory_guard import check_step
                        import jax.numpy as jnp
                        check_step(fused.jit,
                                   (state, train_loader._data, targs,
                                    jnp.float32(lr)),
                                   batch_argnums=(2,),
                                   batch_size=cfg.batch_size, logger=logger,
                                   strict=cfg.memory_guard == "strict")
                    state, losses = fused.train_step(state, targs, lr)
            elif darts_mode:
                batch = shard_batch(set_input(cfg, data), mesh)
                # one fused program per iteration (train + arch on val batch)
                val_batch = shard_batch(set_input(cfg, next(val_stream)),
                                        mesh)
                if guard_pending:
                    guard_pending = False
                    from gcc_tpu.utils.memory_guard import check_step
                    import jax.numpy as jnp
                    check_step(engine.combined_jit,
                               (state, batch, val_batch, jnp.float32(lr),
                                jnp.float32(ema_beta), jnp.float32(arch_lr)),
                               batch_argnums=(1, 2),
                               batch_size=cfg.batch_size, logger=logger,
                               strict=cfg.memory_guard == "strict")
                state, losses = engine.train_arch_step(
                    state, batch, val_batch, lr, ema_beta, arch_lr)
            else:
                batch = shard_batch(set_input(cfg, data), mesh)
                if guard_pending:
                    guard_pending = False
                    from gcc_tpu.utils.memory_guard import check_step
                    import jax.numpy as jnp
                    check_step(engine.train_jit,
                               (state, batch, jnp.float32(lr)),
                               batch_argnums=(1,),
                               batch_size=cfg.batch_size, logger=logger,
                               strict=cfg.memory_guard == "strict")
                state, losses = engine.train_step(state, batch, lr)
            total_iters += cfg.batch_size

            if cfg.check_numerics:
                # one host sync per iteration; aborts with the offending
                # loss NAMES (utils/numerics.py) — the cheap sanitizer vs
                # --debug_nans' per-primitive re-execution
                from gcc_tpu.utils.numerics import assert_finite_losses
                try:
                    assert_finite_losses(losses, epoch=epoch,
                                         iters=total_iters)
                except FloatingPointError as e:
                    logger.error(str(e))
                    raise

            if profile_until is not None and i + 1 >= profile_until:
                jax.block_until_ready(jax.tree_util.tree_leaves(losses))
                jax.profiler.stop_trace()
                logger.info("profiler trace written")
                profile_until = None

            if total_iters % cfg.print_freq < cfg.batch_size:
                vals = {k: float(v) for k, v in losses.items()}
                t_comp = (time.time() - iter_start) / cfg.batch_size
                msg = " ".join(f"{k}: {v:.3f}" for k, v in vals.items())
                logger.info(f"(epoch: {epoch}, iters: {total_iters}, "
                            f"time: {t_comp:.3f}) {msg}")
                if jsonl:
                    jsonl.write({"epoch": epoch, "iters": total_iters,
                                 "lr": lr, **vals})

            if preempt["flag"]:
                save_state(state_path, state)
                with open(meta_path, "w") as f:
                    json.dump({"epoch": epoch - 1,
                               "preempted_in_epoch": epoch}, f)
                logger.info(
                    f"SIGTERM: full train state saved mid-epoch {epoch} "
                    f"(iters {total_iters}); --continue_train restarts "
                    f"epoch {epoch}")
                if prev_sigterm is not None:
                    signal.signal(signal.SIGTERM, prev_sigterm)
                return 0

        if epoch % cfg.save_epoch_freq == 0:
            current_perf = evaluate(cfg, engine, state, logger, epoch)
            _save_best(cfg, engine, state, best, current_perf, epoch, logger)
            if plateau is not None and current_perf is not None:
                scalar = (float(np.mean(list(current_perf.values())))
                          if isinstance(current_perf, dict)
                          else float(current_perf))
                if maximize_metric(cfg):
                    scalar = -scalar
                new_lr = plateau.step(scalar)
                if new_lr != lr:
                    logger.info(f"plateau: lr {lr:.7f} -> {new_lr:.7f}")
            save_state(state_path, state)
            with open(meta_path, "w") as f:
                json.dump({"epoch": epoch}, f)
            if epoch == total_epochs:
                save_checkpoint(
                    ckpt_name(os.path.join(run_dir, "checkpoints"), epoch),
                    engine.checkpoint_payload(state, epoch, current_perf))
        if cfg.darts_discriminator:
            for name, ratio in sparsity_report(
                    _arch_trees(state), threshold=cfg.threshold).items():
                logger.info(f"{name} sparsity ratio: {ratio:.2f}")
        logger.info(f"End of epoch {epoch} / {total_epochs} \t "
                    f"Time Taken: {int(time.time() - epoch_start)} sec \t "
                    f"lr: {lr:.7f} ema_beta: {ema_beta:.4f}")
        if preempt["flag"]:
            # SIGTERM arrived during epoch-end eval/save: the epoch is
            # COMPLETE, so persist with this epoch's number and exit now
            # instead of burning the next epoch's first iteration.
            save_state(state_path, state)
            with open(meta_path, "w") as f:
                json.dump({"epoch": epoch}, f)
            logger.info(f"SIGTERM: full train state saved at end of epoch "
                        f"{epoch}; --continue_train resumes at {epoch + 1}")
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)
            return 0
    if prev_sigterm is not None:
        signal.signal(signal.SIGTERM, prev_sigterm)
    logger.info(best.summary())
    return 0


def _arch_trees(state):
    trees = {}
    for k in ("d", "d_a", "d_b"):
        if k in state.nets and isinstance(state.nets[k], dict) \
                and "arch" in state.nets[k]:
            trees[k] = state.nets[k]["arch"]
    return trees


def _save_best(cfg, engine, state, best, perf, epoch, logger):
    """Best-metric checkpointing (train.py:14-73)."""
    import os as _os
    from gcc_tpu.utils.checkpoint import ckpt_name, save_checkpoint
    save_dir = _os.path.join(cfg.checkpoints_dir, cfg.name, "checkpoints")
    if perf is None:
        return
    if isinstance(perf, dict):  # named metrics (srgan sets / cyclegan dirs)
        sr_sets = ["Set5", "Set14", "B100", "Urban100", "val"]
        for i, (name, value) in enumerate(perf.items()):
            if name.endswith("_psnr") or name.endswith("_ssim"):
                # reference slots: PSNR 0-3, SSIM 4-7 (train.py:47-52)
                base, kind = name.rsplit("_", 1)
                idx = sr_sets.index(base) if base in sr_sets else 0
                idx = min(idx + (4 if kind == "ssim" else 0),
                          len(best.best_metric) - 1)
            else:
                idx = min(i, len(best.best_metric) - 1)
            if best.update(value, epoch, index=idx):
                save_checkpoint(
                    ckpt_name(save_dir, isbest=True, direction=name),
                    engine.checkpoint_payload(state, epoch, value))
                logger.info(f"saving best [{name}] at epoch {epoch}: {value:.4f}")
    else:
        if best.update(float(perf), epoch):
            save_checkpoint(
                ckpt_name(save_dir, isbest=True, direction=cfg.direction),
                engine.checkpoint_payload(state, epoch, float(perf)))
            logger.info(f"saving best model at epoch {epoch}: {perf:.4f}")


if __name__ == "__main__":
    raise SystemExit(main())
