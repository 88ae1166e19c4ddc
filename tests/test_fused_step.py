"""The fused train+arch program (what cli.train dispatches,
CombinedStepMixin.train_arch_step) computes exactly the separate
train_step-then-arch_step sequence (what the composed-parity oracles pin
against torch). Together the chain is closed: oracle == separate ==
fused == the CLI's per-iteration program.

Tolerance 1e-6: both paths trace the same _train_step/_arch_step
functions; the only admissible difference is XLA scheduling/fusion
reassociation inside one program vs two.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcc_tpu.config import Config
from gcc_tpu.engines.pix2pix import Pix2PixEngine


@pytest.mark.slow
def test_fused_equals_separate_pix2pix():
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 num_downs=5, crop_size=32, no_dropout=True, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 lambda_L1=100.0, lambda_content=50.0, lambda_gram=1e4,
                 lr=2e-4, arch_lr=1e-4)
    eng = Pix2PixEngine(cfg)
    rng = np.random.RandomState(3)

    def mk():
        return {"A": jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1,
                                 jnp.float32),
                "B": jnp.asarray(rng.rand(2, 32, 32, 3) * 2 - 1,
                                 jnp.float32)}

    batch, val = mk(), mk()
    s_sep = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    s_fus = eng.init_state(jax.random.PRNGKey(0), image_size=32)

    s_sep, m1 = eng.train_step(s_sep, batch, 2e-4)
    s_sep, m2 = eng.arch_step(s_sep, val, 0.9, 1e-4)
    m_sep = {**m1, **m2}
    s_fus, m_fus = eng.train_arch_step(s_fus, batch, val, 2e-4, 0.9, 1e-4)

    assert set(m_sep) == set(m_fus)
    for k in m_sep:
        a, b = float(m_sep[k]), float(m_fus[k])
        print(f"{k}: sep={a:.6f} fused={b:.6f} delta={abs(a - b):.2e}")
        assert abs(a - b) < 1e-6 + 1e-6 * abs(a), k

    fa = jax.tree_util.tree_leaves(s_sep.nets)
    fb = jax.tree_util.tree_leaves(s_fus.nets)
    worst = max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(fa, fb))
    print(f"worst param/state delta: {worst:.2e}")
    assert worst < 1e-6
