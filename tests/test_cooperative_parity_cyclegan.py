"""Composed cooperative-iteration parity for the CYCLEGAN family.

Extends tests/test_cooperative_parity.py's proof to the structurally
different second family: dual generators/discriminators with joint Adam
updates, G-then-D order, InstanceNorm everywhere except the masked
(BatchNorm) student D, plain-MSE distillation with DETACHED teacher-D
features, per-feature-pair L1-to-teacher, per-direction discrepancy EMAs
(models/CycleGAN.py:342-640, train.py:144-151).

Replay pools are disabled on both sides (pool_size=0 == the reference's
ImagePool(0) pass-through): the pool's coin flips can't be made
bit-identical across frameworks, and everything else can.

Tolerances are differentiated by a measured root cause. After one
iteration, every teacher/student conv KERNEL matches torch to ~1e-9
EXCEPT a handful of isolated entries that differ by exactly 2*lr=4e-4:
where the true gradient is ~0, fp noise (~1e-9, different between
frameworks) decides the sign of Adam's first normalized step
(update ~ -lr*g/(|g|+eps) = -lr*sign(noise)), so those entries take
OPPOSITE unit steps. Likewise every conv bias that feeds an InstanceNorm
has mathematically zero gradient (IN subtracts the channel mean), so
those biases random-walk at +-lr per step — but they are forward-inert.
The only forward-visible chaos is the isolated kernel flips; they shift
the POST-UPDATE teacher forward by ~1e-3, and the lsgan discrepancy
|1 - 2*mean(p)| inherits that, so the D_arch/teacher-EMA keys are
chaotic at the few-1e-2 level by iter 2 while all sixteen structural
loss keys stay <=1e-3. A systematic wiring bug (wrong term, wrong
ordering, wrong detach) would instead show as an O(1) mismatch in some
structural key at iter 0, where everything matches to ~1e-6.
(Diagnostic: torch-vs-jax per-tensor weight deltas after 1 iteration —
bimodal at 1e-9 and exactly 4.00e-4; see the class tolerances below.)
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

from torch_ref_cyclegan import CycleGANOracle  # noqa: E402

from gcc_tpu.config import Config  # noqa: E402
from gcc_tpu.engines.cyclegan import CycleGANEngine  # noqa: E402

N_ITERS = 3
LAMS = dict(lambda_A=10.0, lambda_B=10.0, lambda_identity=0.5,
            lambda_content=0.01, lambda_gram=10.0, lambda_L1=1.0)


def _np_tree(t):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), t)


@pytest.fixture(scope="module")
def trajectories():
    cfg = Config(model="cyclegan", ngf=4, ndf=8, teacher_ngf=8,
                 teacher_ndf=8, crop_size=32, gan_mode="lsgan",
                 online_distillation=True, darts_discriminator=True,
                 pool_size=0, lr=2e-4, arch_lr=1e-4, **LAMS)
    eng = CycleGANEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(1), image_size=32)
    nets0 = _np_tree(state.nets)

    torch.manual_seed(0)
    oracle = CycleGANOracle(ngf=4, ndf=8, teacher_ngf=8, teacher_ndf=8,
                            n_blocks=9, lambda_A=10.0, lambda_B=10.0,
                            lambda_idt=0.5, lambda_content=0.01,
                            lambda_gram=10.0, lambda_l1=1.0,
                            lr=2e-4, arch_lr=1e-4)
    oracle.load_from_jax_state(nets0)

    rng = np.random.RandomState(11)

    def mk():
        return (rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)

    t_hist, j_hist = [], []
    for _ in range(N_ITERS):
        A, B, Av, Bv = mk(), mk(), mk(), mk()
        t = oracle.iteration(
            torch.tensor(np.transpose(A, (0, 3, 1, 2))),
            torch.tensor(np.transpose(B, (0, 3, 1, 2))),
            torch.tensor(np.transpose(Av, (0, 3, 1, 2))),
            torch.tensor(np.transpose(Bv, (0, 3, 1, 2))), ema_beta=0.9)
        t_hist.append(t)

        state, m1 = eng.train_step(
            state, {"A": jnp.asarray(A), "B": jnp.asarray(B)}, 2e-4)
        state, m2 = eng.arch_step(
            state, {"A": jnp.asarray(Av), "B": jnp.asarray(Bv)}, 0.9)
        j_hist.append({k: float(v) for k, v in {**m1, **m2}.items()})
    return oracle, state, t_hist, j_hist


# Keys derived from the POST-UPDATE teacher forward (see module docstring:
# isolated Adam sign-flips at near-zero gradients make these chaotic at the
# few-1e-2 level; they still pin EMA wiring, which would be off by O(1)
# if e.g. the bootstrap or beta orientation were wrong).
CHAOTIC = {"D_arch_A", "D_arch_B", "D_arch_diff_A", "D_arch_diff_B",
           "teacher_netD_A_arch_diff", "teacher_netD_B_arch_diff"}


def test_loss_trajectory_parity(trajectories):
    _, _, t_hist, j_hist = trajectories
    keys = sorted(t_hist[0])
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        for k in keys:
            print(f"iter {i} {k}: torch={t[k]:.6f} jax={j[k]:.6f} "
                  f"delta={abs(t[k] - j[k]):.2e}")
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        assert set(keys) <= set(j), set(keys) - set(j)
        for k in keys:
            if k in CHAOTIC:
                tol = 3e-2
            elif i == 0:
                # pre-update forward: pins loss composition exactly
                tol = 1e-5 + 1e-4 * abs(t[k])
            else:
                tol = 1e-4 + 2e-3 * abs(t[k])
            assert abs(t[k] - j[k]) < tol, \
                f"iter {i} loss '{k}': torch {t[k]} vs jax {j[k]}"


def test_final_param_parity(trajectories):
    oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)

    # A parameter can drift at most 2*lr per step relative to torch (the
    # opposite-sign unit-Adam-step ceiling; module docstring), so max is
    # bounded by 2*lr*N_ITERS*1.25 while the MEAN pins the bulk: a
    # systematic gradient bug (missing/extra loss term) moves most entries
    # by ~a full Adam step per iteration (>=6e-4 over 3 iters), whereas
    # chaos feedback keeps the bulk under half a step (measured: students
    # ~5e-6, teacher conv_in 5.4e-5 from flip-perturbed gradients).
    def close(torch_w, jax_w, name, perm=None, lr=2e-4, mean_tol=None):
        a = torch_w.detach().numpy()
        b = np.asarray(jax_w)
        if perm:
            b = np.transpose(b, perm)
        d = np.abs(a - b)
        print(f"{name}: max|delta| = {d.max():.2e} mean = {d.mean():.2e}")
        assert d.max() < 2 * lr * N_ITERS * 1.25, f"{name} diverged: {d.max()}"
        assert d.mean() < (mean_tol or lr / 2), f"{name} bulk drift: {d.mean()}"

    # student generators: stem + a mid separable block, both directions
    for side, g in (("a", oracle.sGA), ("b", oracle.sGB)):
        p = nets[f"g_{side}"]["params"]
        close(g.model[1].weight, p["conv_in"]["kernel"],
              f"sG{side}.conv_in", perm=(3, 2, 0, 1))
        close(g.model[14].conv_block[1].conv[0].weight,
              p["block_4_sep1"]["depthwise"]["kernel"],
              f"sG{side}.block4.dw", perm=(3, 2, 0, 1))
        close(g.model[14].conv_block[1].conv[2].weight,
              p["block_4_sep1"]["pointwise"]["kernel"],
              f"sG{side}.block4.pw", perm=(3, 2, 0, 1))
    # teacher generator (it trains too)
    close(oracle.tGA.model[1].weight,
          nets["tg_a"]["params"]["conv_in"]["kernel"], "tGA.conv_in",
          perm=(3, 2, 0, 1))
    # teacher D (trains; InstanceNorm layout)
    close(oracle.tDA.model[2].weight,
          nets["td_a"]["params"]["conv_1"]["kernel"], "tDA.conv1",
          perm=(3, 2, 0, 1))
    # student masked D convs + DARTS alphas (the arch step's subject)
    close(oracle.sDA.model[0].weight,
          nets["d_a"]["params"]["conv_0"]["kernel"], "sDA.conv0",
          perm=(3, 2, 0, 1))
    # alphas inherit the EMA chaos through a SIGN: their gradient carries
    # d|disc - ema|/d(alpha) = sign(disc - ema) * ..., and torch-vs-jax
    # EMAs differ at the ~1e-2 chaos level (module docstring), so when
    # disc-ema crosses zero the WHOLE alpha gradient flips and every entry
    # takes a full opposite arch_lr step. Mean bound 2*arch_lr (measured
    # 1.6e-4); a systematically wrong arch loss would pin the sign every
    # iteration (>=6e-4).
    for side, d in (("a", oracle.sDA), ("b", oracle.sDB)):
        arch = nets[f"d_{side}"]["arch"]
        close(d.model[2].alpha, arch["mask_0"]["alpha"], f"sD{side}.alpha0",
              lr=1e-4, mean_tol=2e-4)
        close(d.model[13].alpha, arch["mask_3"]["alpha"], f"sD{side}.alpha3",
              lr=1e-4, mean_tol=2e-4)
    # 1x1 transforms
    close(oracle.trA[0].weight,
          nets["tf_a"]["params"]["tf_0"]["kernel"], "trA.0",
          perm=(3, 2, 0, 1))


def test_final_bn_stats_parity(trajectories):
    """Masked student D BatchNorm running stats agree — pins the
    per-forward update count (g step + d step + arch step = 5/iter).
    Tolerance 5e-4: stats accumulate forwards of student fakes, which
    inherit the ~1e-4 kernel-flip drift (module docstring); a missing or
    extra stats update would shift the running mean by O(batch mean) ~1e-1.
    """
    oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)
    for side, d in (("a", oracle.sDA), ("b", oracle.sDB)):
        s = nets[f"d_{side}"]["batch_stats"]
        for torch_idx, jax_name in ((4, "norm_1"), (12, "norm_3")):
            a = d.model[torch_idx].running_mean.detach().numpy()
            b = np.asarray(s[jax_name]["mean"])
            dlt = np.max(np.abs(a - b))
            print(f"sD{side}.{jax_name}.running_mean: {dlt:.2e}")
            assert dlt < 5e-4
            a = d.model[torch_idx].running_var.detach().numpy()
            b = np.asarray(s[jax_name]["var"])
            assert np.max(np.abs(a - b)) < 5e-4
