"""Numeric pin of the spectral-norm v column-order conversion.

torch matricizes w.view(height, -1) over C-ordered (c,kh,kw) columns
(SAGAN.py:31-38); ops/spectral.py moves the height axis to the front of
the HWIO kernel, giving (h,w,c) columns. u and sigma are invariant to the
column permutation, but the stored v is not — torch_export._inv_spec_v /
torch_port._spec_v convert between the conventions so the power-iteration
state round-trips into each framework's own order.
"""

import numpy as np

from gcc_tpu.utils import torch_port as tp
from gcc_tpu.utils.torch_export import _inv_spec_v

R = np.random.RandomState(0)


def test_roundtrip_identity_conv_and_deconv():
    k = R.rand(4, 4, 3, 8).astype(np.float32)  # HWIO
    # conv: torch weight (O,I,kh,kw), height=O, columns (I,kh,kw)
    v_j = R.rand(4 * 4 * 3).astype(np.float32)
    v_t = _inv_spec_v(v_j, k, deconv=False)
    sd = {"m.weight_bar": np.transpose(k, (3, 2, 0, 1)), "m.weight_v": v_t}
    assert np.array_equal(tp._spec_v(sd, "m"), v_j)
    # deconv: torch ConvTranspose weight (I,O,kh,kw), height=I, cols (O,kh,kw)
    v_j2 = R.rand(4 * 4 * 8).astype(np.float32)
    v_t2 = _inv_spec_v(v_j2, k, deconv=True)
    sd2 = {"m.weight_bar": np.transpose(k, (2, 3, 0, 1)), "m.weight_v": v_t2}
    assert np.array_equal(tp._spec_v(sd2, "m"), v_j2)


def test_sigma_invariant_and_power_iteration_commutes():
    """The same mathematical v expressed in either column order yields the
    same sigma = u^T W v, and one power-iteration update computed in the
    jax matricization then converted equals the update computed directly
    in the torch matricization — the conversion is the exact change of
    basis, not an approximation."""
    k = R.rand(4, 4, 3, 8).astype(np.float32)
    u = R.rand(8).astype(np.float32)
    v_j = R.rand(4 * 4 * 3).astype(np.float32)
    v_t = _inv_spec_v(v_j, k)
    Wj = np.moveaxis(k, 3, 0).reshape(8, -1)        # (O,(h,w,i))
    Wt = np.transpose(k, (3, 2, 0, 1)).reshape(8, -1)  # (O,(i,kh,kw))
    assert abs(float(u @ Wj @ v_j) - float(u @ Wt @ v_t)) < 1e-4
    v_next_j = Wj.T @ u
    v_next_t = Wt.T @ u
    assert np.abs(_inv_spec_v(v_next_j, k) - v_next_t).max() < 1e-6
