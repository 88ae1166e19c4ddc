"""Packed dataset pipeline: stream parity vs the online datasets.

The packed path (gcc_tpu/data/packed.py) must be a DROP-IN replacement:
same samples, same order, same rng stream on the same seed — asserted
bit-exactly against AlignedDataset / UnalignedDataset / SADataset /
SRDataset (reference data/{aligned,unaligned,sa,sr}_dataset.py semantics).
The uint8 + device_normalize fast path must match the float32 host path
within 1 ulp (XLA lowers x/255 as a reciprocal multiply; values are in
[-1, 1] so 1 ulp is ~1.2e-7).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from gcc_tpu.config import Config
from gcc_tpu.data import build_dataset, create_dataset
from gcc_tpu.data.datasets import (AlignedDataset, SADataset, SRDataset,
                                   UnalignedDataset)
from gcc_tpu.data.packed import (PACK_META, PackedDataset, device_normalize,
                                 is_packed_root, pack_dataset)


def _imgs(d, n, w, h, seed=0, prefix="img"):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{prefix}_{i:03d}.png"))


def _assert_item_eq(a, b):
    assert sorted(a) == sorted(b)
    for k in a:
        if isinstance(a[k], np.ndarray):
            assert a[k].dtype == b[k].dtype, k
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            assert a[k] == b[k], k


def _assert_stream_eq(ds_ref, ds_packed, n=None):
    n = len(ds_ref) if n is None else n
    assert len(ds_ref) == len(ds_packed)
    for i in range(n):
        _assert_item_eq(ds_ref[i], ds_packed[i])


class TestAlignedParity:
    def _cfg(self, root, **kw):
        base = dict(dataroot=root, phase="train", dataset_mode="aligned",
                    load_size=24, crop_size=16, no_flip=False,
                    preprocess="resize_and_crop")
        base.update(kw)
        return Config(**base)

    def test_stream_parity_and_autodetect(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 6, w=40, h=30)
        cfg = self._cfg(root)
        packed_root = pack_dataset(cfg, num_threads=2)
        assert is_packed_root(packed_root)
        _assert_stream_eq(AlignedDataset(cfg, seed=3),
                          PackedDataset(cfg.replace(dataroot=packed_root),
                                        seed=3))
        # auto-detect through the registry
        ds = build_dataset(cfg.replace(dataroot=packed_root), seed=3)
        assert isinstance(ds, PackedDataset)

    def test_no_flip_and_max_dataset_size(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 6, w=40, h=30)
        cfg = self._cfg(root, no_flip=True, max_dataset_size=4.0)
        packed_root = pack_dataset(cfg, num_threads=1,
                                   out_dir=str(tmp_path / "p2"))
        pd = PackedDataset(cfg.replace(dataroot=packed_root), seed=7)
        assert len(pd) == 4
        _assert_stream_eq(AlignedDataset(cfg, seed=7), pd)

    def test_validation_errors(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 2, w=40, h=30)
        cfg = self._cfg(root)
        packed_root = pack_dataset(cfg, num_threads=1)
        with pytest.raises(ValueError, match="re-pack"):
            PackedDataset(cfg.replace(dataroot=packed_root, load_size=32))
        with pytest.raises(FileNotFoundError, match="no phase 'val'"):
            PackedDataset(cfg.replace(dataroot=packed_root, phase="val"))
        with pytest.raises(ValueError, match="dataset_mode"):
            PackedDataset(cfg.replace(dataroot=packed_root,
                                      dataset_mode="unaligned"))


class TestUnalignedParity:
    def _cfg(self, root, **kw):
        base = dict(dataroot=root, phase="train", dataset_mode="unaligned",
                    load_size=24, crop_size=16, no_flip=False,
                    preprocess="resize_and_crop")
        base.update(kw)
        return Config(**base)

    @pytest.mark.parametrize("serial", [False, True])
    def test_stream_parity(self, tmp_path, serial):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "trainA"), 5, w=40, h=30, seed=1)
        _imgs(os.path.join(root, "trainB"), 7, w=36, h=28, seed=2)
        cfg = self._cfg(root, serial_batches=serial)
        packed_root = pack_dataset(cfg, num_threads=2)
        _assert_stream_eq(
            UnalignedDataset(cfg, seed=5),
            PackedDataset(cfg.replace(dataroot=packed_root), seed=5))

    def test_split_dataset_halves(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "trainA"), 6, w=40, h=30, seed=1)
        _imgs(os.path.join(root, "trainB"), 6, w=36, h=28, seed=2)
        cfg = self._cfg(root, split_dataset=True, serial_batches=True)
        packed_root = pack_dataset(cfg, num_threads=1)
        for part in (True, False):
            _assert_stream_eq(
                UnalignedDataset(cfg, seed=5, first_part=part),
                PackedDataset(cfg.replace(dataroot=packed_root), seed=5,
                              first_part=part))


class TestSAParity:
    def test_stream_parity(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 4, w=200, h=180)
        cfg = Config(dataroot=root, phase="train", dataset_mode="sa",
                     model="sagan", crop_size=32, center_crop=True, z_dim=8)
        packed_root = pack_dataset(cfg, num_threads=2)
        _assert_stream_eq(SADataset(cfg, seed=11),
                          PackedDataset(cfg.replace(dataroot=packed_root),
                                        seed=11))


class TestSRParity:
    def test_train_and_test_split(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 4, w=70, h=60)
        _imgs(os.path.join(root, "Set5"), 2, w=37, h=53)
        cfg = Config(dataroot=root, phase="train", dataset_mode="sr",
                     model="srgan", image_size=48, upscale_factor=4)
        packed_root = pack_dataset(cfg, num_threads=2)
        pack_dataset(cfg.replace(phase="Set5"), num_threads=1)
        _assert_stream_eq(SRDataset(cfg, seed=13),
                          PackedDataset(cfg.replace(dataroot=packed_root),
                                        seed=13))
        _assert_stream_eq(
            SRDataset(cfg, seed=13, test_data_name="Set5"),
            PackedDataset(cfg.replace(dataroot=packed_root), seed=13,
                          test_data_name="Set5"))


class TestUint8DevicePath:
    def test_device_normalize_matches_host(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 3, w=40, h=30)
        cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                     load_size=24, crop_size=16, no_flip=False,
                     preprocess="resize_and_crop")
        packed_root = pack_dataset(cfg, num_threads=1)
        pcfg = cfg.replace(dataroot=packed_root)
        f32 = PackedDataset(pcfg, seed=9)
        u8 = PackedDataset(pcfg, seed=9, out_dtype="uint8")
        import jax.numpy as jnp
        for i in range(len(f32)):
            a, b = f32[i], u8[i]
            assert b["A"].dtype == np.uint8
            dev = device_normalize({"A": b["A"], "B": b["B"]}, jnp.float32)
            np.testing.assert_allclose(np.asarray(dev["A"]), a["A"],
                                       rtol=0, atol=2.4e-7)
            np.testing.assert_allclose(np.asarray(dev["B"]), a["B"],
                                       rtol=0, atol=2.4e-7)

    def test_sr_uint8_specs(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 2, w=70, h=60)
        cfg = Config(dataroot=root, phase="train", dataset_mode="sr",
                     model="srgan", image_size=48, upscale_factor=4)
        packed_root = pack_dataset(cfg, num_threads=1)
        pcfg = cfg.replace(dataroot=packed_root)
        f32 = PackedDataset(pcfg, seed=2)
        u8 = PackedDataset(pcfg, seed=2, out_dtype="uint8")
        import jax.numpy as jnp
        a, b = f32[0], u8[0]
        dev = device_normalize({"lr": b["lr"], "hr": b["hr"]}, jnp.float32,
                               specs=u8.norm_spec)
        np.testing.assert_allclose(np.asarray(dev["lr"]), a["lr"],
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(dev["hr"]), a["hr"],
                                   rtol=0, atol=2.4e-7)

    def test_set_input_handles_uint8(self, tmp_path):
        from gcc_tpu.cli.train import set_input
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 2, w=40, h=30)
        cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                     load_size=24, crop_size=16, preprocess="resize_and_crop",
                     compute_dtype="float32", direction="BtoA", batch_size=2)
        packed_root = pack_dataset(cfg, num_threads=1)
        pcfg = cfg.replace(dataroot=packed_root)
        loader = create_dataset(pcfg, prefer_uint8=True)
        batch = next(iter(loader))
        assert batch["A"].dtype == np.uint8
        out = set_input(pcfg, batch)
        # direction swap happened, values normalized
        np.testing.assert_allclose(
            np.asarray(out["A"]),
            (batch["B"].astype(np.float32) / 255.0) * 2.0 - 1.0,
            rtol=0, atol=2.4e-7)


class TestPackedLoader:
    def test_whole_batch_fast_path(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 8, w=40, h=30)
        cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                     load_size=24, crop_size=16, preprocess="resize_and_crop",
                     batch_size=4, num_threads=2, serial_batches=True)
        packed_root = pack_dataset(cfg, num_threads=1)
        loader = create_dataset(cfg.replace(dataroot=packed_root))
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["A"].shape == (4, 16, 16, 3)
        assert isinstance(batches[0]["A_paths"], list)

    def test_meta_merges_phases(self, tmp_path):
        root = str(tmp_path / "src")
        _imgs(os.path.join(root, "train"), 2, w=40, h=30)
        _imgs(os.path.join(root, "val"), 2, w=40, h=30)
        cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                     load_size=24, crop_size=16, preprocess="resize_and_crop")
        out = pack_dataset(cfg, num_threads=1)
        pack_dataset(cfg.replace(phase="val"), num_threads=1)
        with open(os.path.join(out, PACK_META)) as f:
            meta = json.load(f)
        assert set(meta["phases"]) == {"train", "val"}


@pytest.mark.slow
def test_train_from_packed_root(tmp_path):
    """cli.train end-to-end on a packed dataroot: uint8 batches through
    set_input/device_normalize, epoch-end eval from the packed 'val' phase
    (the pix2pix eval protocol pins load_size=256, test_metric.py:16-21)."""
    from gcc_tpu.cli.train import main as train_main
    root = str(tmp_path / "src")
    _imgs(os.path.join(root, "train"), 8, w=64, h=32)
    _imgs(os.path.join(root, "val"), 2, w=64, h=32)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=32, crop_size=32, no_flip=True,
                 preprocess="resize_and_crop")
    packed_root = pack_dataset(cfg, num_threads=2)
    pack_dataset(cfg.replace(phase="val", load_size=256), num_threads=2)
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot {packed_root} --dataset_mode aligned "
            f"--model pix2pix --ngf 4 --ndf 4 --teacher_ngf 8 "
            f"--teacher_ndf 8 --num_downs 5 --crop_size 32 --load_size 32 "
            f"--batch_size 4 --n_epochs 1 --n_epochs_decay 0 "
            f"--print_freq 100 --online_distillation --darts_discriminator "
            f"--lambda_content 50 --lambda_gram 1e4 --name pk "
            f"--checkpoints_dir {exp} --save_epoch_freq 1 "
            f"--ntest 2").split()
    assert train_main(args) == 0
    assert os.path.exists(os.path.join(exp, "pk", "checkpoints",
                                       "model_best_AtoB.ckpt"))


def test_prepare_cli(tmp_path):
    from gcc_tpu.cli.prepare import main
    root = str(tmp_path / "src")
    _imgs(os.path.join(root, "train"), 2, w=40, h=30)
    out = str(tmp_path / "out")
    rc = main(["--dataroot", root, "--dataset_mode", "aligned",
               "--phase", "train", "--pack_output", out,
               "--model", "pix2pix"])
    assert rc == 0 and is_packed_root(out)
