"""dup_adam_step == torch Adam with a twice-added param in one group.

The reference's SAGAN optimizer scans (models/SAGAN.py:315-327, 339-346)
add SpectralNorm-wrapped convs and attention q/k/v convs TWICE to one
param group; torch applies one update per occurrence sharing moment/step
state. dup_adam_step replicates that; this pins it numerically over a
multi-step trajectory with varying gradients, against torch itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gcc_tpu.engines.common import (  # noqa: E402
    adam_step, dup_adam_step, dup_path_mask, make_adam,
)

LR = 1e-3
N_STEPS = 5


def _run_torch(b1, b2, grads_seq, w0_dup, w0_single):
    p_dup = torch.nn.Parameter(torch.tensor(w0_dup))
    p_single = torch.nn.Parameter(torch.tensor(w0_single))
    # p_dup appears twice, as in the reference scans
    opt = torch.optim.Adam([p_dup, p_single, p_dup], lr=LR, betas=(b1, b2),
                           eps=1e-8)
    for g_dup, g_single in grads_seq:
        opt.zero_grad()
        p_dup.grad = torch.tensor(g_dup)
        p_single.grad = torch.tensor(g_single)
        opt.step()
    return p_dup.detach().numpy(), p_single.detach().numpy()


@pytest.mark.parametrize("b1,b2", [(0.0, 0.9), (0.5, 0.999)])
def test_matches_torch_duplicate_group(b1, b2):
    rng = np.random.RandomState(3)
    w0 = {"l1": {"kernel": rng.randn(4, 3).astype(np.float32)},
          "bn1": {"scale": rng.randn(3).astype(np.float32)}}
    grads_seq = [(rng.randn(4, 3).astype(np.float32),
                  rng.randn(3).astype(np.float32))
                 for _ in range(N_STEPS)]

    t_dup, t_single = _run_torch(b1, b2, grads_seq,
                                 w0["l1"]["kernel"], w0["bn1"]["scale"])

    tx_s, tx_d = make_adam(b1, b2), make_adam(b1, b2)
    params = jax.tree_util.tree_map(jnp.asarray, w0)
    mask = dup_path_mask(params, lambda p: "l1" in p.split("/"))
    assert mask == {"l1": {"kernel": True}, "bn1": {"scale": False}}
    st = (tx_s.init(params), tx_d.init(params))
    for g_dup, g_single in grads_seq:
        grads = {"l1": {"kernel": jnp.asarray(g_dup)},
                 "bn1": {"scale": jnp.asarray(g_single)}}
        params, st = dup_adam_step(tx_s, tx_d, grads, st, params,
                                   jnp.float32(LR), mask)

    np.testing.assert_allclose(np.asarray(params["l1"]["kernel"]), t_dup,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(params["bn1"]["scale"]), t_single,
                               atol=2e-6)
    # and the doubled param really moved ~2x a single-stepped one
    tx = make_adam(b1, b2)
    p1 = {"k": jnp.asarray(w0["l1"]["kernel"])}
    s1 = tx.init(p1)
    for g_dup, _ in grads_seq:
        p1, s1 = adam_step(tx, {"k": jnp.asarray(g_dup)}, s1, p1,
                           jnp.float32(LR))
    moved_dup = np.abs(np.asarray(params["l1"]["kernel"])
                       - w0["l1"]["kernel"]).mean()
    moved_single = np.abs(np.asarray(p1["k"]) - w0["l1"]["kernel"]).mean()
    assert moved_dup > 1.5 * moved_single
