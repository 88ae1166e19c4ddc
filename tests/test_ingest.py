"""Evaluator-weights ingestion runbook (gcc_tpu/metrics/ingest.py).

cli.convert --evaluator must take a user-supplied .pth, validate it with
actionable errors, self-check forward parity against the from-spec torch
oracle, and emit the native .npz the evaluators consume — exercised
end-to-end with randomly-initialized fixtures for all three evaluators
(the real pretrained weights cannot be downloaded here; reference sources
metric/inception.py:13, metric/drn.py:8-18, models/GANLoss.py:95-144).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gcc_tpu.metrics.ingest import IngestError, ingest_evaluator  # noqa: E402
from gcc_tpu.utils import torch_ref_evaluators as tre  # noqa: E402

THIN_DRN = (1, 1, 2, 2, 2, 2, 1, 1)  # every structural element, CPU-fast


def _fixture(kind, tmp_path, seed=0):
    if kind == "inception":
        tm = tre.TFIDInception()
    elif kind == "drn":
        tm = tre.TDRNSeg(layers=THIN_DRN)
    else:
        tm = tre.TVGG19Features()
    tre.randomize(tm, seed=seed)
    if kind == "drn":
        tm.restore_fixed_up()
    path = str(tmp_path / f"{kind}.pth")
    sd = tm.state_dict()
    if kind == "drn":  # reference ckpts carry DataParallel prefixes
        sd = {"module." + k: v for k, v in sd.items()}
    torch.save(sd, path)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["inception", "drn", "vgg"])
def test_ingest_happy_path(kind, tmp_path):
    path = _fixture(kind, tmp_path)
    out = str(tmp_path / f"{kind}.npz")
    layers = THIN_DRN if kind == "drn" else None
    report = ingest_evaluator(kind, path, out, layers=layers)
    assert os.path.exists(out)
    assert report["roundtrip"] == "bitwise"
    assert report["forward_rel_err_vs_torch"] < 1e-4


@pytest.mark.slow
def test_ingest_via_cli(tmp_path):
    from gcc_tpu.cli.convert import main as convert_main
    path = _fixture("vgg", tmp_path)
    out = str(tmp_path / "vgg.npz")
    assert convert_main(["--evaluator", "vgg", "--pretrain_path", path,
                         "--output", out]) == 0
    assert os.path.exists(out)
    # the emitted npz loads through the evaluator's own loader
    from gcc_tpu.metrics.vgg import load_torch_vgg19
    params = load_torch_vgg19(out)
    assert params["conv_0"]["kernel"].shape == (3, 3, 3, 64)


def test_ingest_missing_keys_actionable(tmp_path):
    tm = tre.TVGG19Features()
    sd = tm.state_dict()
    sd.pop("features.28.weight")
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)
    with pytest.raises(IngestError, match="features.28.weight"):
        ingest_evaluator("vgg", path, str(tmp_path / "o.npz"), parity=False)


def test_ingest_wrong_shapes_actionable(tmp_path):
    tm = tre.TVGG19Features()
    sd = tm.state_dict()
    sd["features.0.weight"] = torch.zeros(8, 3, 3, 3)  # wrong out-channels
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)
    with pytest.raises(IngestError, match="shape mismatch"):
        ingest_evaluator("vgg", path, str(tmp_path / "o.npz"), parity=False)


def test_ingest_wrong_family_actionable(tmp_path):
    """Handing the vgg file to the inception ingester names the missing key
    and the expected source."""
    path = _fixture("vgg", tmp_path)
    with pytest.raises(IngestError, match="TF-FID"):
        ingest_evaluator("inception", path, str(tmp_path / "o.npz"),
                         parity=False)


def test_ingest_not_a_state_dict(tmp_path):
    path = str(tmp_path / "junk.pth")
    torch.save([1, 2, 3], path)
    with pytest.raises(IngestError, match="state_dict"):
        ingest_evaluator("vgg", path, str(tmp_path / "o.npz"))


def test_ingest_container_descent(tmp_path):
    tm = tre.TVGG19Features()
    tre.randomize(tm, seed=4)
    path = str(tmp_path / "ckpt.pth")
    torch.save({"epoch": 3, "state_dict": tm.state_dict()}, path)
    report = ingest_evaluator("vgg", path, str(tmp_path / "o.npz"))
    assert report["container"] == "descended into 'state_dict'"
    assert report["forward_rel_err_vs_torch"] < 1e-4
