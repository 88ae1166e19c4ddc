"""Composed cooperative-iteration parity for the SAGAN family.

Extends the pix2pix/cyclegan composed proofs to the third structural
variant: hinge loss, TTUR (D at 4x), D-THEN-G order, spectral-norm
power-iteration state threaded through every forward, BatchNorm only in G,
and — unique to SAGAN — the reference's DOUBLE-ADDED optimizer groups
(models/SAGAN.py:315-346): every SpectralNorm-wrapped conv and attention
q/k/v conv of the student G/D appears twice in its Adam param group, so
torch steps them twice per iteration. The jax engine replicates that via
dup_adam_step; this test pins the composed dynamics against a from-spec
torch oracle with ported identical weights.

Tolerance classes come from a MEASURED root-cause analysis (distinct from
cyclegan's): with Adam betas (0, 0.9) the first normalized step is
sign(g), so torch-vs-jax fp32 framework noise (~1e-6 absolute on conv
outputs — different conv algorithms/reduction orders) flips the step
direction of near-zero-gradient entries, and the spectral-norm
power-iteration state then amplifies those isolated +-2*eff_lr kernel
deltas into the D outputs. Probe (torch-vs-torch with a 1e-6 initial-weight
perturbation, 3 iterations, same batches): 140/384 sD.l1 entries beyond lr,
sD u drift 3.5e-2, D_arch delta 1.3e-2 — the same regime as the
torch-vs-jax deltas (u 0.11, D_arch 8.4e-2), with NON-monotonic dependence
on perturbation size (1e-5 gives smaller deltas than 1e-6): chaos, not a
systematic error. A wiring bug would instead show at iteration 0, where
every pre-update loss matches to <=2e-5 and the composed losses to <=2e-3.
The per-forward power-iteration count is pinned separately by the
chaos-free frozen-weight test below.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks"))

from torch_ref_sagan import SAGANOracle  # noqa: E402

from gcc_tpu.config import Config  # noqa: E402
from gcc_tpu.engines.sagan import SAGANEngine  # noqa: E402

N_ITERS = 3
LR = 2e-4


def _np_tree(t):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), t)


@pytest.fixture(scope="module")
def trajectories():
    # ngf/ndf >= 8: the reference attention uses c//8 q/k channels
    # (SAGAN.py:81-82), which is ZERO below width 8 — the reference itself
    # cannot run there (our SelfAttention clamps to max(c//8, 1))
    cfg = Config(model="sagan", ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                 z_dim=8, crop_size=64, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 lambda_content=1.0, lambda_gram=1.0, lambda_L1=0.5,
                 lr=LR, arch_lr=1e-4)
    eng = SAGANEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(2))
    nets0 = _np_tree(state.nets)

    torch.manual_seed(0)
    oracle = SAGANOracle(ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                         z_dim=8, lambda_content=1.0, lambda_gram=1.0,
                         lambda_l1=0.5, lr=LR, arch_lr=1e-4)
    oracle.load_from_jax_state(nets0)

    rng = np.random.RandomState(7)

    def mk_img():
        return (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)

    def mk_z():
        return rng.randn(2, 8).astype(np.float32)

    t_hist, j_hist = [], []
    for _ in range(N_ITERS):
        z, real, zv, realv = mk_z(), mk_img(), mk_z(), mk_img()
        t = oracle.iteration(
            torch.tensor(z),
            torch.tensor(np.transpose(real, (0, 3, 1, 2))),
            torch.tensor(zv),
            torch.tensor(np.transpose(realv, (0, 3, 1, 2))), ema_beta=0.9)
        t_hist.append(t)

        state, m1 = eng.train_step(
            state, {"z": jnp.asarray(z), "real_img": jnp.asarray(real)}, LR)
        state, m2 = eng.arch_step(
            state, {"z": jnp.asarray(zv), "real_img": jnp.asarray(realv)},
            0.9)
        j_hist.append({k: float(v) for k, v in {**m1, **m2}.items()})
    return eng, nets0, oracle, state, t_hist, j_hist


# tolerance classes per the module-docstring probe: STRUCTURAL keys are
# computed from pre-update nets (exact at iter 0); AMPLIFIED (G_GAN) sits
# one D-update downstream of the first sign flips; CHAOTIC keys inherit
# the spectral-norm-amplified drift (probe regime ~1e-2..1e-1 by iter 2)
CHAOTIC = {"D_arch", "D_arch_diff", "teacher_D_arch_diff"}
AMPLIFIED = {"G_GAN"}


def test_loss_trajectory_parity(trajectories):
    _, _, _, _, t_hist, j_hist = trajectories
    keys = sorted(t_hist[0])
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        for k in keys:
            print(f"iter {i} {k}: torch={t[k]:.6f} jax={j[k]:.6f} "
                  f"delta={abs(t[k] - j[k]):.2e}")
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        assert set(keys) <= set(j), set(keys) - set(j)
        for k in keys:
            if k in CHAOTIC:
                tol = 5e-3 if i == 0 else 2e-1
            elif k in AMPLIFIED:
                tol = 2e-3 if i == 0 else 3e-2
            elif i == 0:
                tol = 2e-5 + 2e-4 * abs(t[k])
            else:
                tol = 2e-3 + 2e-2 * abs(t[k])
            assert abs(t[k] - j[k]) < tol, \
                f"iter {i} loss '{k}': torch {t[k]} vs jax {j[k]}"


def test_final_param_parity(trajectories):
    _, _, oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)

    # max bounded by the opposite-unit-Adam-step ceiling 2*eff_lr*N_ITERS
    # (cyclegan test docstring); eff_lr = lr * ttur * dup multiplicity.
    # Mean pins the bulk at half an effective step.
    def close(torch_w, jax_w, name, perm=None, eff_lr=LR, mean_tol=None):
        a = torch_w.detach().numpy()
        b = np.asarray(jax_w)
        if perm:
            b = np.transpose(b, perm)
        d = np.abs(a - b)
        print(f"{name}: max|delta| = {d.max():.2e} mean = {d.mean():.2e}")
        assert d.max() < 2 * eff_lr * N_ITERS * 1.25, \
            f"{name} diverged: {d.max()}"
        assert d.mean() < (mean_tol or eff_lr / 2), \
            f"{name} bulk drift: {d.mean()}"

    # student G: dup spectral deconv (2x lr), single-stepped head (1x);
    # deconv kernels are HWIO of the forward conv -> torch (I,O,kh,kw)
    # via perm (2,3,0,1) (torch_export._inv_deconv)
    close(oracle.sG.l2[0].module.weight_bar,
          nets["g"]["params"]["l2"]["kernel"], "sG.l2.bar",
          perm=(2, 3, 0, 1), eff_lr=2 * LR)
    close(oracle.sG.last[0].weight, nets["g"]["params"]["last"]["kernel"],
          "sG.last", perm=(2, 3, 0, 1), eff_lr=LR)
    close(oracle.sG.attn2.value_conv.weight,
          nets["g"]["params"]["attn2"]["value_conv"]["kernel"],
          "sG.attn2.v", perm=(3, 2, 0, 1), eff_lr=2 * LR)
    # student D: dup spectral conv at TTUR (2*4x), single head (4x)
    close(oracle.sD.l1[0].module.weight_bar,
          nets["d"]["params"]["l1"]["kernel"], "sD.l1.bar",
          perm=(3, 2, 0, 1), eff_lr=8 * LR)
    close(oracle.sD.last[0].weight, nets["d"]["params"]["last"]["kernel"],
          "sD.last", perm=(3, 2, 0, 1), eff_lr=4 * LR)
    # teacher nets: plain single-stepped groups
    close(oracle.tG.l1[0].module.weight_bar,
          nets["tg"]["params"]["l1"]["kernel"], "tG.l1.bar",
          perm=(2, 3, 0, 1), eff_lr=LR)
    close(oracle.tD.l2[0].module.weight_bar,
          nets["td"]["params"]["l2"]["kernel"], "tD.l2.bar",
          perm=(3, 2, 0, 1), eff_lr=4 * LR)
    # transforms (single)
    close(oracle.transforms[0].weight,
          nets["tf"]["params"]["tf_0"]["kernel"], "tf0",
          perm=(3, 2, 0, 1), eff_lr=LR)
    # DARTS alphas (see cyclegan test: EMA-sign chaos -> mean 2*arch_lr)
    mask_mods = [m for m in oracle.sD.modules()
                 if m.__class__.__name__ == "TorchMaskOp"]
    for i, mm in enumerate(mask_mods):
        close(mm.alpha, nets["d"]["arch"][f"mask_{i + 1}"]["alpha"],
              f"sD.alpha{i + 1}", eff_lr=1e-4, mean_tol=2e-4)


def test_spectral_state_parity(trajectories):
    """u power-iteration vectors stay in the same regime after 3
    iterations x 5 D forwards. Tolerances are the measured chaos bounds
    (module docstring: the 1e-6 probe moves sD u by 3.5e-2 torch-vs-torch;
    torch-vs-jax lands at ~0.11) — a gross error (power iteration on the
    wrong matricization, sigma from stale u) still blows past them. The
    EXACT per-forward update count/order is pinned chaos-free by
    test_spectral_forward_count_parity below."""
    _, _, oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)
    for i in (1, 4):
        a = getattr(oracle.sD, f"l{i}")[0].module.weight_u.detach().numpy()
        b = np.asarray(nets["d"]["spectral"][f"l{i}"]["u"])
        d = np.max(np.abs(a - b))
        print(f"sD.l{i}.u: max|delta| = {d:.2e}")
        assert d < 0.3
        a = getattr(oracle.tD, f"l{i}")[0].module.weight_u.detach().numpy()
        b = np.asarray(nets["td"]["spectral"][f"l{i}"]["u"])
        assert np.max(np.abs(a - b)) < 0.1


def test_spectral_forward_count_parity(trajectories):
    """Chaos-free pinning of the spectral power-iteration semantics: with
    FROZEN initial weights (no optimizer in the loop), 3 successive student-D
    forwards must evolve every layer's u identically in torch and jax —
    one v<-l2n(W^T u), u<-l2n(W v) update per forward, in call order
    (SAGAN.py:53-71). A missing, extra, or re-ordered update diverges at
    the first comparison; fp32 noise cannot hide it (tol 1e-5)."""
    eng, nets0, _, _, _, _ = trajectories
    from torch_ref_sagan import SAGANOracle
    torch.manual_seed(0)
    fresh = SAGANOracle(ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                        z_dim=8, lr=LR, arch_lr=1e-4)
    fresh.load_from_jax_state(nets0)

    from gcc_tpu.engines.common import apply_net
    rng = np.random.RandomState(3)
    v = {k: val for k, val in nets0["d"].items()}
    v = jax.tree_util.tree_map(jnp.asarray, v)
    for step in range(3):
        x = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
        with torch.no_grad():
            fresh.sD(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
        _, v, _ = apply_net(eng.D, v, jnp.asarray(x))
        for i in (1, 2, 3, 4):
            a = getattr(fresh.sD, f"l{i}")[0].module.weight_u.detach().numpy()
            b = np.asarray(v["spectral"][f"l{i}"]["u"])
            d = np.max(np.abs(a - b))
            assert d < 1e-5, f"forward {step} l{i}.u: {d}"
        print(f"forward {step}: all u within 1e-5")


def test_final_bn_stats_parity(trajectories):
    """Student G BatchNorm running stats agree — pins the per-forward
    stats-update count (1 per train step + 1 per arch step)."""
    _, _, oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)
    for i in (1, 4):
        bn = getattr(oracle.sG, f"l{i}")[1]
        b = np.asarray(nets["g"]["batch_stats"][f"bn{i}"]["mean"])
        d = np.max(np.abs(bn.running_mean.detach().numpy() - b))
        print(f"sG.bn{i}.running_mean: {d:.2e}")
        assert d < 5e-3
        b = np.asarray(nets["g"]["batch_stats"][f"bn{i}"]["var"])
        assert np.max(np.abs(bn.running_var.detach().numpy() - b)) < 5e-3
