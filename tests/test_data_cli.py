"""Data pipeline + CLI end-to-end tests (synthetic data, tiny configs)."""

import os

import numpy as np
import pytest
from PIL import Image

from gcc_tpu.config import Config, parse
from gcc_tpu.data import create_dataset, create_split_dataset
from gcc_tpu.data.datasets import AlignedDataset, SRDataset, SyntheticDataset
from gcc_tpu.data.loader import InfiniteLoader, Loader
from gcc_tpu.data.transforms import apply_transform, get_params


def _write_ab_images(root, n=6, w=64, h=32):
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img_{i:03d}.png"))
    return root


class TestTransforms:
    def test_resize_crop_flip_normalize(self):
        cfg = Config(preprocess="resize_and_crop", load_size=32, crop_size=16,
                     no_flip=False)
        img = Image.fromarray(
            (np.arange(24 * 24 * 3).reshape(24, 24, 3) % 255).astype(np.uint8))
        rng = np.random.RandomState(0)
        params = get_params(cfg, img.size, rng)
        out = apply_transform(cfg, img, params)
        assert out.shape == (16, 16, 3)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_no_crop_when_sizes_match(self):
        cfg = Config(preprocess="resize_and_crop", load_size=32, crop_size=32,
                     no_flip=True)
        img = Image.new("RGB", (48, 48), (128, 64, 32))
        out = apply_transform(cfg, img,
                              get_params(cfg, img.size,
                                         np.random.RandomState(0)))
        assert out.shape == (32, 32, 3)
        # uniform image: value preserved through resize
        np.testing.assert_allclose(out[0, 0], np.float32(
            [128, 64, 32]) / 255 * 2 - 1, atol=1e-6)


class TestAlignedDataset:
    def test_pairs_share_params(self, tmp_path):
        root = _write_ab_images(str(tmp_path))
        cfg = Config(dataroot=root, phase="train", load_size=16, crop_size=16,
                     no_flip=True, preprocess="resize_and_crop")
        ds = AlignedDataset(cfg)
        assert len(ds) == 6
        item = ds[0]
        assert item["A"].shape == (16, 16, 3)
        assert item["B"].shape == (16, 16, 3)
        assert item["A_paths"] == item["B_paths"]


class TestLoader:
    def test_batching_and_shuffle(self):
        cfg = Config(model="pix2pix", dataset_mode="synthetic", crop_size=16)
        ds = SyntheticDataset(cfg, length=10)
        loader = Loader(ds, batch_size=4, shuffle=True, num_threads=2, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["A"].shape == (4, 16, 16, 3)
        assert batches[-1]["A"].shape == (2, 16, 16, 3)
        assert isinstance(batches[0]["A_paths"], list)

    def test_infinite_loader_cycles(self):
        cfg = Config(model="pix2pix", dataset_mode="synthetic", crop_size=16)
        loader = Loader(SyntheticDataset(cfg, length=4), batch_size=4)
        inf = InfiniteLoader(loader)
        for _ in range(3):
            b = next(inf)
            assert b["A"].shape[0] == 4

    def test_create_split_dataset(self):
        cfg = Config(model="pix2pix", dataset_mode="synthetic", crop_size=16,
                     batch_size=2, num_threads=1)
        train, val = create_split_dataset(cfg)
        assert len(train) == len(val)


class TestSRDatasetProtocol:
    def test_test_split_center_crop_divisible(self, tmp_path):
        d = os.path.join(str(tmp_path), "val")
        os.makedirs(d)
        Image.fromarray(np.zeros((37, 53, 3), np.uint8)).save(
            os.path.join(d, "a.png"))
        cfg = Config(dataroot=str(tmp_path), phase="val", image_size=96,
                     upscale_factor=4)
        ds = SRDataset(cfg)
        item = ds[0]
        h, w = item["hr"].shape[:2]
        assert h % 4 == 0 and w % 4 == 0
        assert item["lr"].shape[:2] == (h // 4, w // 4)


def test_config_cli_types():
    cfg = parse("--model pix2pix --crop_size 64 --lr 1e-3 "
                "--target_budget 3.0 --dataroot synthetic "
                "--dataset_mode synthetic".split())
    assert cfg.crop_size == 64 and isinstance(cfg.crop_size, int)
    assert cfg.lr == 1e-3
    assert cfg.target_budget == 3.0
    assert cfg.dataset_mode == "synthetic"  # survives the pix2pix preset
    assert cfg.lambda_L1 == 100.0  # preset applied


def test_sagan_dump_cap_defaults_to_1000():
    """Reference test.py:51 breaks the sagan image-dump loop at i == 1000;
    with the default --ntest inf we mirror that cap. Explicit --ntest wins;
    other families keep dumping the whole set (test.py:27-28 cap is
    commented out in the reference)."""
    from gcc_tpu.cli.test import dump_cap
    sagan = parse("--model sagan --dataroot synthetic "
                  "--dataset_mode synthetic".split())
    assert dump_cap(sagan) == 1000
    sagan_n = parse("--model sagan --dataroot synthetic --ntest 7 "
                    "--dataset_mode synthetic".split())
    assert dump_cap(sagan_n) == 7
    p2p = parse("--model pix2pix --dataroot synthetic "
                "--dataset_mode synthetic".split())
    assert dump_cap(p2p) is None
    p2p_n = parse("--model pix2pix --dataroot synthetic --ntest 12 "
                  "--dataset_mode synthetic".split())
    assert dump_cap(p2p_n) == 12


def test_cyclegan_pool_size_preset():
    """Reference parity: ImagePool(50) for all pools (CycleGAN.py:342-343);
    an explicitly passed --pool_size still wins."""
    cfg = parse("--model cyclegan --dataroot synthetic "
                "--dataset_mode synthetic".split())
    assert cfg.pool_size == 50
    cfg2 = parse("--model cyclegan --dataroot synthetic --pool_size 7 "
                 "--dataset_mode synthetic".split())
    assert cfg2.pool_size == 7
    # teacher pools share the student pool size inside the engine
    from gcc_tpu.config import Config
    from gcc_tpu.engines.cyclegan import CycleGANEngine
    import jax
    c = Config(model="cyclegan", ngf=4, ndf=4, teacher_ngf=4, teacher_ndf=4,
               crop_size=32, pool_size=3, online_distillation=True)
    eng = CycleGANEngine(c)
    st = eng.init_state(jax.random.PRNGKey(0))
    assert st.nets["pool_a"]["buffer"].shape[0] == 3
    assert st.nets["tpool_a"]["buffer"].shape[0] == 3


@pytest.mark.slow
def test_train_test_roundtrip_pix2pix(tmp_path):
    """2-iteration GCC train -> checkpoint -> test rebuild (SURVEY.md §4)."""
    from gcc_tpu.cli.train import main as train_main
    from gcc_tpu.cli.test import main as test_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
            f"--ngf 4 --ndf 4 --teacher_ngf 8 --teacher_ndf 8 --num_downs 5 "
            f"--crop_size 32 --load_size 32 --batch_size 4 --n_epochs 1 "
            f"--n_epochs_decay 0 --print_freq 100 --online_distillation "
            f"--darts_discriminator --lambda_content 50 --lambda_gram 1e4 "
            f"--name rt --checkpoints_dir {exp} --save_epoch_freq 1 "
            f"--ntest 4").split()
    assert train_main(args) == 0
    ckpt = os.path.join(exp, "rt", "checkpoints", "model_best_AtoB.ckpt")
    assert os.path.exists(ckpt)
    # --spatial_shards exercises the SP path through BOTH the image-dump
    # loop and the metric eval orchestrator (parallel/spatial.py)
    targs = (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
             f"--ngf 4 --ndf 4 --num_downs 5 --crop_size 32 --load_size 32 "
             f"--pretrain_path {ckpt} --name rt_test --checkpoints_dir {exp} "
             f"--ntest 2 --darts_discriminator --spatial_shards 4").split()
    assert test_main(targs) == 0
    results = os.listdir(os.path.join(exp, "rt_test", "test_results"))
    assert len(results) >= 2


@pytest.mark.slow
def test_train_srgan_generator_only(tmp_path):
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model srgan "
            f"--ngf 4 --ndf 4 --image_size 32 --batch_size 2 --n_epochs 1 "
            f"--n_epochs_decay 0 --generator_only --print_freq 100 "
            f"--name sro --checkpoints_dir {exp} --save_epoch_freq 1 "
            f"--ntest 2").split()
    assert train_main(args) == 0
    assert os.path.exists(os.path.join(exp, "sro", "checkpoints"))

@pytest.mark.slow
def test_train_test_roundtrip_sagan(tmp_path):
    from gcc_tpu.cli.train import main as train_main
    from gcc_tpu.cli.test import main as test_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model sagan "
            f"--ngf 4 --ndf 4 --teacher_ngf 8 --teacher_ndf 8 --z_dim 16 "
            f"--batch_size 4 --n_epochs 1 --n_epochs_decay 0 "
            f"--print_freq 100 --online_distillation --darts_discriminator "
            f"--lambda_content 1 --lambda_gram 1 --name sg "
            f"--checkpoints_dir {exp} --save_epoch_freq 1 --ntest 2").split()
    assert train_main(args) == 0
    ckpt = os.path.join(exp, "sg", "checkpoints", "model_best_AtoB.ckpt")
    assert os.path.exists(ckpt)
    targs = (f"--dataroot synthetic --dataset_mode synthetic --model sagan "
             f"--ngf 4 --ndf 4 --z_dim 16 --pretrain_path {ckpt} "
             f"--name sg_test --checkpoints_dir {exp} --ntest 2 "
             f"--darts_discriminator").split()
    assert test_main(targs) == 0


@pytest.mark.slow
def test_train_roundtrip_cyclegan(tmp_path):
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model cyclegan "
            f"--ngf 4 --ndf 4 --teacher_ngf 8 --teacher_ndf 8 --crop_size 32 "
            f"--load_size 32 --batch_size 1 --n_epochs 1 --n_epochs_decay 0 "
            f"--print_freq 1000 --online_distillation --darts_discriminator "
            f"--lambda_content 0.01 --lambda_gram 10 --pool_size 4 "
            f"--name cg --checkpoints_dir {exp} --save_epoch_freq 1 "
            f"--max_dataset_size 6 --ntest 2").split()
    assert train_main(args) == 0
    # cyclegan saves per-direction bests
    files = os.listdir(os.path.join(exp, "cg", "checkpoints"))
    assert any("model_best" in f for f in files)


@pytest.mark.slow
def test_three_stage_workflow_pix2pix(tmp_path):
    """The canonical reference workflow end-to-end (README.md:38-62):
    stage 1 sparsity pretrain -> stage 2 prune-from-checkpoint + GCC
    cooperative train -> stage 3 rebuild-from-cfg test."""
    from gcc_tpu.cli.train import main as train_main
    from gcc_tpu.cli.test import main as test_main
    from gcc_tpu.utils.checkpoint import load_checkpoint, restore_cfg
    exp = str(tmp_path / "experiments")

    common = (f"--dataroot synthetic --dataset_mode synthetic "
              f"--model pix2pix --ngf 4 --ndf 4 --num_downs 5 "
              f"--crop_size 32 --load_size 32 --batch_size 4 "
              f"--n_epochs 1 --n_epochs_decay 0 --save_epoch_freq 1 "
              f"--checkpoints_dir {exp} --print_freq 100")

    # stage 1: L1-sparsity pretrain on BN scales (grad injection)
    assert train_main((common + " --lambda_scale 1e-2 --name s1").split()) == 0
    ckpt1 = os.path.join(exp, "s1", "checkpoints", "model_best_AtoB.ckpt")
    assert os.path.exists(ckpt1)

    # stage 2: prune the sparse checkpoint to a budget, attach teacher +
    # masked D, GCC cooperative train
    assert train_main(
        (common + f" --scale_prune --target_budget 0.001 "
                  f"--pretrain_path {ckpt1} --teacher_ngf 8 --teacher_ndf 8 "
                  f"--online_distillation --darts_discriminator "
                  f"--lambda_content 50 --lambda_gram 1e4 "
                  f"--name s2").split()) == 0
    ckpt2 = os.path.join(exp, "s2", "checkpoints", "model_best_AtoB.ckpt")
    fc, cc = restore_cfg(load_checkpoint(ckpt2))
    assert fc is not None and cc is not None  # pruned topology travels
    from gcc_tpu.models.generators import unet_default_filter_cfgs
    assert list(fc) != unet_default_filter_cfgs(4, 5)  # actually pruned

    # stage 3: rebuild the pruned architecture from the ckpt cfg alone
    assert test_main(
        (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
         f"--ngf 4 --ndf 4 --num_downs 5 --crop_size 32 --load_size 32 "
         f"--pretrain_path {ckpt2} --name s3 --checkpoints_dir {exp} "
         f"--ntest 2").split()) == 0
    assert os.listdir(os.path.join(exp, "s3", "test_results"))


@pytest.mark.slow
def test_continue_train_resumes(tmp_path):
    """--continue_train restores the FULL state (params + Adam moments +
    EMA + rng) and continues at the next epoch — the reference declares the
    flag but never uses it (options/options.py:29)."""
    import json
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    base = (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
            f"--ngf 4 --ndf 4 --num_downs 5 --crop_size 32 --load_size 32 "
            f"--batch_size 4 --n_epochs_decay 0 --save_epoch_freq 1 "
            f"--checkpoints_dir {exp} --print_freq 100 --name resume")
    assert train_main((base + " --n_epochs 1").split()) == 0
    meta = os.path.join(exp, "resume", "checkpoints", "train_state.json")
    with open(meta) as f:
        assert json.load(f)["epoch"] == 1
    # second invocation continues at epoch 2 instead of restarting
    assert train_main((base + " --n_epochs 2 --continue_train").split()) == 0
    with open(meta) as f:
        assert json.load(f)["epoch"] == 2
    log = open(os.path.join(exp, "resume", "logger.log")).read()
    assert "continuing at epoch 2" in log


@pytest.mark.slow
def test_sigterm_graceful_preempt(tmp_path):
    """TPU-pod preemption contract: SIGTERM mid-run finishes the in-flight
    iteration, persists the FULL train state, and exits 0; --continue_train
    then restarts the interrupted epoch. (The reference has no recovery at
    all — its --continue_train flag is dead, options/options.py:29.)"""
    import json
    import signal
    import threading
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    base = (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
            f"--ngf 4 --ndf 4 --num_downs 5 --crop_size 32 --load_size 32 "
            f"--batch_size 4 --n_epochs_decay 0 --save_epoch_freq 1000 "
            f"--checkpoints_dir {exp} --print_freq 100 --name preempt")
    # enough epochs that the signal always lands mid-run; fires during the
    # first compile at worst, which still preempts after iteration 1
    timer = threading.Timer(
        15.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        rc = train_main((base + " --n_epochs 100000").split())
    finally:
        timer.cancel()
    assert rc == 0
    meta_path = os.path.join(exp, "preempt", "checkpoints",
                             "train_state.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert "preempted_in_epoch" in meta
    assert meta["epoch"] == meta["preempted_in_epoch"] - 1
    log = open(os.path.join(exp, "preempt", "logger.log")).read()
    assert "SIGTERM: full train state saved" in log
    # resume completes the interrupted epoch and finishes cleanly
    # (save_epoch_freq re-set so the final epoch writes its meta)
    resume_to = meta["preempted_in_epoch"]
    assert train_main(
        (base + f" --n_epochs {resume_to} --continue_train "
                f"--save_epoch_freq {resume_to}").split()) == 0
    with open(meta_path) as f:
        assert json.load(f)["epoch"] == resume_to
    log = open(os.path.join(exp, "preempt", "logger.log")).read()
    assert f"continuing at epoch {resume_to}" in log


def test_epoch_keyed_shuffle_resume_order():
    """Loader.set_epoch keys each epoch's shuffle to the epoch number, so a
    resumed run replays the SAME per-epoch order an uninterrupted run saw
    (torch DistributedSampler.set_epoch convention); without set_epoch the
    legacy sequential stream is unchanged."""
    from gcc_tpu.data.loader import Loader

    class Ints:
        def __len__(self):
            return 17

        def __getitem__(self, i):
            return {"v": np.asarray([i])}

    def order(loader):
        return [int(v) for b in loader for v in b["v"].ravel()]

    a = Loader(Ints(), batch_size=4, shuffle=True, num_threads=1, seed=3)
    b = Loader(Ints(), batch_size=4, shuffle=True, num_threads=1, seed=3)
    # uninterrupted run: epochs 1..3
    orders = {}
    for e in (1, 2, 3):
        a.set_epoch(e)
        orders[e] = order(a)
    assert orders[1] != orders[2]  # reshuffles between epochs
    # "resumed" run starts directly at epoch 3 and must match
    b.set_epoch(3)
    assert order(b) == orders[3]
    # legacy mode (no set_epoch): stream depends on iteration count only
    c = Loader(Ints(), batch_size=4, shuffle=True, num_threads=1, seed=3)
    d = Loader(Ints(), batch_size=4, shuffle=True, num_threads=1, seed=3)
    assert order(c) == order(d)


@pytest.mark.slow
def test_check_numerics_aborts_on_nan_step(tmp_path):
    """--check_numerics: a NaN-injected training run (lr=nan poisons the
    params at step 1; the step-2 losses go non-finite) aborts with a
    FloatingPointError naming the offending losses instead of silently
    training on garbage (VERDICT r4 item 7; SURVEY.md §5 sanitizers row)."""
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model pix2pix "
            f"--ngf 4 --ndf 4 --num_downs 5 --crop_size 32 --load_size 32 "
            f"--batch_size 4 --n_epochs 1 --n_epochs_decay 0 "
            f"--print_freq 1000 --name nan --checkpoints_dir {exp} "
            f"--save_epoch_freq 1 --lr nan --check_numerics").split()
    with pytest.raises(FloatingPointError, match=r"non-finite loss"):
        train_main(args)
