"""Numerical forward parity for the two evaluator ports.

The FID/mIoU "within 1% of reference" north-star rests on
gcc_tpu/metrics/inception.py and gcc_tpu/metrics/miou.py computing the same
function as the reference's torch evaluators (metric/inception.py:166-315,
metric/drn.py:104-255 + metric/mIoU_score.py:122-160). These tests build
both evaluators in torch FROM THE BEHAVIORAL SPEC (not copied code, same
pattern as tests/test_torch_parity.py), randomize every parameter including
BatchNorm running statistics, port through the repo's own loaders, and
require output parity — including the 299-resize + (0,1)->(-1,1) input
protocol and the fixed bilinear 8x grouped-deconv upsample.

The from-spec torch topologies live in gcc_tpu/utils/torch_ref_evaluators.py
(shared with the ``cli.convert --evaluator`` ingestion self-check).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcc_tpu.metrics.inception import (FIDInceptionV3,  # noqa: E402
                                       load_torch_fid_inception)
from gcc_tpu.metrics.miou import (DRNSeg, load_torch_drnseg,  # noqa: E402
                                  upsample_logits_8x)
from gcc_tpu.utils.torch_ref_evaluators import (TDRNSeg,  # noqa: E402
                                                TFIDInception)
from gcc_tpu.utils.torch_ref_evaluators import randomize as _randomize
from gcc_tpu.utils.torch_ref_evaluators import rel_err as _rel_err


@pytest.mark.slow
def test_fid_inception_forward_parity(tmp_path):
    tm = TFIDInception()
    _randomize(tm, seed=3)
    path = str(tmp_path / "fid_inception.pth")
    torch.save(tm.state_dict(), path)

    params = load_torch_fid_inception(path)
    model = FIDInceptionV3()

    rng = np.random.RandomState(7)
    x = rng.rand(2, 96, 96, 3).astype(np.float32)  # (0,1), odd size on purpose
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert ours.shape == ref.shape == (2, 2048)
    assert _rel_err(ours, ref) < 1e-4, _rel_err(ours, ref)


def test_resize_bilinear_matches_torch():
    """jax.image.resize(bilinear, antialias=False) must equal torch
    F.interpolate(bilinear, align_corners=False) — the FID input protocol."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 17, 23, 3).astype(np.float32)
    ref = F.interpolate(torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                        size=(299, 299), mode="bilinear",
                        align_corners=False).numpy()
    ours = jax.image.resize(jnp.asarray(x), (1, 299, 299, 3), "bilinear",
                            antialias=False)
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               ref, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_drnseg_forward_parity(tmp_path):
    # a thin DRN-D (layer5 shortened 23->3 blocks) keeps CPU time sane while
    # exercising every structural element: plain conv layers, strided and
    # dilated bottlenecks, downsample branches, seg head, 8x deconv
    layers = (1, 1, 3, 4, 3, 3, 1, 1)
    tm = TDRNSeg(layers=layers)
    _randomize(tm, seed=11)
    tm.restore_fixed_up()
    path = str(tmp_path / "drn.pth")
    # reference checkpoints carry a DataParallel 'module.' prefix
    torch.save({"module." + k: v for k, v in tm.state_dict().items()}, path)

    params = load_torch_drnseg(path, layers=layers)
    model = DRNSeg(layers=layers)

    rng = np.random.RandomState(5)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    logits = model.apply({"params": params}, jnp.asarray(x))
    ours = np.transpose(np.asarray(upsample_logits_8x(logits)), (0, 3, 1, 2))

    assert ours.shape == ref.shape == (1, 19, 64, 64)
    assert _rel_err(ours, ref) < 1e-4, _rel_err(ours, ref)


@pytest.mark.slow
def test_drnseg_full_depth_parity(tmp_path):
    """One full-depth DRN-D-105 check at a small spatial size: pins the
    actual [1,1,3,4,23,3,1,1] topology the evaluator runs with."""
    tm = TDRNSeg()
    _randomize(tm, seed=13)
    tm.restore_fixed_up()
    path = str(tmp_path / "drn105.pth")
    torch.save(tm.state_dict(), path)

    params = load_torch_drnseg(path)
    model = DRNSeg()

    rng = np.random.RandomState(6)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    logits = model.apply({"params": params}, jnp.asarray(x))
    ours = np.transpose(np.asarray(upsample_logits_8x(logits)), (0, 3, 1, 2))

    assert ours.shape == ref.shape == (1, 19, 32, 32)
    assert _rel_err(ours, ref) < 1e-4, _rel_err(ours, ref)
