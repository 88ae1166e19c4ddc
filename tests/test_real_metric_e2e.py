"""End-to-end integration of the REAL metric path (VERDICT r4 item 1).

The north-star quality claim ("FID/mIoU within 1% of the reference") runs
through exactly these lines: cli/get_real_stat.py (real-image InceptionV3
mu/sigma -> real_stat_<side>.npz, reference metric/get_real_stat.py:36-89),
then the real-FID branch (eval/orchestrators.py `_inception_acts` +
fid_from_activations) and the mIoU branch (compute_miou) inside the
epoch-end eval of cli.train and the final eval of cli.test (reference
metric/test_metric.py:15-56).

Real pretrained evaluator weights cannot be downloaded here (no egress), so
tiny RANDOM-weight inception/DRN fixtures are built through the existing
ingestion path (gcc_tpu/metrics/ingest.py — the same command a user runs on
the real .pth files); the code path from the CLI flag to the metric value is
the real one end to end. Asserts: the REAL branches execute (log lines carry
no "[proxy]" marker), the values are finite, and two cli.test runs of the
same checkpoint reproduce the value exactly.
"""

import os
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from PIL import Image  # noqa: E402

from gcc_tpu.metrics.ingest import ingest_evaluator  # noqa: E402
from gcc_tpu.utils import torch_ref_evaluators as tre  # noqa: E402

THIN_DRN = (1, 1, 2, 2, 2, 2, 1, 1)  # every structural element, CPU-fast


def _write_aligned_root(root, n_train=6, n_val=4, w=64, h=32, seed=0):
    """AB (side-by-side) aligned dataset with train/ and val/ phases."""
    rng = np.random.RandomState(seed)
    names = {}
    for phase, n in (("train", n_train), ("val", n_val)):
        d = os.path.join(root, phase)
        os.makedirs(d, exist_ok=True)
        names[phase] = []
        for i in range(n):
            arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            name = f"img_{phase}_{i:03d}"
            Image.fromarray(arr).save(os.path.join(d, name + ".png"))
            names[phase].append(name)
    return names


def _grep_log(run_dir, pattern):
    with open(os.path.join(run_dir, "logger.log")) as f:
        return re.findall(pattern, f.read())


@pytest.fixture(scope="module")
def inception_npz(tmp_path_factory):
    """Random-weight TF-FID InceptionV3 through the real ingestion command
    (parity self-check covered by test_ingest/test_evaluator_parity)."""
    d = tmp_path_factory.mktemp("inception_fixture")
    tm = tre.TFIDInception()
    tre.randomize(tm, seed=7)
    pth = str(d / "pt_inception.pth")
    torch.save(tm.state_dict(), pth)
    out = str(d / "pt_inception.npz")
    ingest_evaluator("inception", pth, out, parity=False)
    return out


@pytest.fixture(scope="module")
def drn_npz(tmp_path_factory):
    """Random-weight thin DRNSeg through the real ingestion command, with
    the reference's DataParallel 'module.' prefixes."""
    d = tmp_path_factory.mktemp("drn_fixture")
    tm = tre.TDRNSeg(layers=THIN_DRN)
    tre.randomize(tm, seed=11)
    tm.restore_fixed_up()
    pth = str(d / "drn-d-105_ms_cityscapes.pth")
    torch.save({"module." + k: v for k, v in tm.state_dict().items()}, pth)
    out = str(d / "drn.npz")
    ingest_evaluator("drn", pth, out, layers=THIN_DRN, parity=False)
    return out


@pytest.mark.slow
def test_real_fid_branch_through_clis(tmp_path, inception_npz):
    """get_real_stat -> train (epoch-end real FID) -> test x2 (deterministic
    real FID), no proxy fallback anywhere."""
    from gcc_tpu.cli.get_real_stat import main as stat_main
    from gcc_tpu.cli.test import main as test_main
    from gcc_tpu.cli.train import main as train_main

    root = str(tmp_path / "facades_e2e")
    _write_aligned_root(root)
    common = (f"--dataroot {root} --dataset_mode aligned --model pix2pix "
              f"--direction AtoB --load_size 32 --crop_size 32 "
              f"--num_downs 5 --ngf 4 --ndf 4 "
              f"--inception_path {inception_npz}")

    # 1. real statistics over the train side (get_real_stat.py:36-89)
    assert stat_main((common + " --phase train --batch_size 2").split()) == 0
    stat = os.path.join(root, "real_stat_B.npz")
    assert os.path.exists(stat)
    npz = np.load(stat)
    assert npz["mu"].shape == (2048,) and npz["sigma"].shape == (2048, 2048)

    # 2. one training epoch; the epoch-end eval must take the REAL FID
    # branch (orchestrators.py _eval_pix2pix: inception acts + real_stat)
    exp = str(tmp_path / "experiments")
    assert train_main(
        (common + f" --batch_size 2 --n_epochs 1 --n_epochs_decay 0 "
         f"--save_epoch_freq 1 --print_freq 100 --name fid_e2e "
         f"--checkpoints_dir {exp}").split()) == 0
    run_dir = os.path.join(exp, "fid_e2e")
    fids = _grep_log(run_dir, r"FID: ([0-9.+-eE]+)")
    assert len(fids) == 1 and np.isfinite(float(fids[0]))
    assert not _grep_log(run_dir, r"\[proxy\]")
    ckpt = os.path.join(run_dir, "checkpoints", "model_best_AtoB.ckpt")
    assert os.path.exists(ckpt)

    # 3. cli.test twice: the real branch again, and bit-identical values
    vals = []
    for name in ("fid_t1", "fid_t2"):
        assert test_main(
            (common + f" --pretrain_path {ckpt} --name {name} "
             f"--checkpoints_dir {exp} --ntest 4").split()) == 0
        rd = os.path.join(exp, name)
        got = _grep_log(rd, r"FID: ([0-9.+-eE]+)")
        assert len(got) == 1 and np.isfinite(float(got[0]))
        assert not _grep_log(rd, r"\[proxy\]")
        vals.append(float(got[0]))
    assert vals[0] == vals[1]


@pytest.mark.slow
def test_real_miou_branch_through_clis(tmp_path, drn_npz):
    """cityscapes dataroot + --drn_path: train's epoch-end eval and
    cli.test both take the REAL mIoU branch (compute_miou: DRN forward,
    8x deconv upsample, table.txt label lookup, fast_hist)."""
    from gcc_tpu.cli.test import main as test_main
    from gcc_tpu.cli.train import main as train_main

    root = str(tmp_path / "cityscapes_e2e")
    names = _write_aligned_root(root)
    # trainIds labels + table.txt (reference datasets/table.txt contract:
    # "<name> <label_file> <leftImg8bit_file>"); 128x256 keeps the thin-DRN
    # forward CPU-fast — compute_miou reads the protocol resolution from
    # the label, which on real cityscapes is its native 1024x2048
    rng = np.random.RandomState(3)
    lab_dir = os.path.join(root, "labels")
    os.makedirs(lab_dir)
    table_lines = []
    for name in names["val"] + names["train"]:
        lab = rng.randint(0, 19, size=(128, 256)).astype(np.uint8)
        Image.fromarray(lab).save(os.path.join(lab_dir, name + "_label.png"))
        table_lines.append(
            f"{name} labels/{name}_label.png {name}_leftImg8bit.png")
    with open(os.path.join(os.path.dirname(drn_npz), "table.txt"), "w") as f:
        f.write("\n".join(table_lines) + "\n")

    common = (f"--dataroot {root} --dataset_mode aligned --model pix2pix "
              f"--direction BtoA --load_size 32 --crop_size 32 "
              f"--num_downs 5 --ngf 4 --ndf 4 --drn_path {drn_npz}")
    exp = str(tmp_path / "experiments")
    assert train_main(
        (common + f" --batch_size 2 --n_epochs 1 --n_epochs_decay 0 "
         f"--save_epoch_freq 1 --print_freq 100 --name miou_e2e "
         f"--checkpoints_dir {exp}").split()) == 0
    run_dir = os.path.join(exp, "miou_e2e")
    mious = _grep_log(run_dir, r"mIoU: ([0-9.+-eE]+)")
    assert len(mious) == 1 and np.isfinite(float(mious[0]))
    assert not _grep_log(run_dir, r"\[proxy\]")
    ckpt = os.path.join(run_dir, "checkpoints", "model_best_BtoA.ckpt")
    assert os.path.exists(ckpt)

    vals = []
    for name in ("miou_t1", "miou_t2"):
        assert test_main(
            (common + f" --pretrain_path {ckpt} --name {name} "
             f"--checkpoints_dir {exp} --ntest 4").split()) == 0
        rd = os.path.join(exp, name)
        got = _grep_log(rd, r"mIoU: ([0-9.+-eE]+)")
        assert len(got) == 1 and np.isfinite(float(got[0]))
        assert not _grep_log(rd, r"\[proxy\]")
        vals.append(float(got[0]))
    assert vals[0] == vals[1]
