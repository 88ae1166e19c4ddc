"""Algorithm-level parity of the COMPOSED cooperative iteration.

Every part of the GCC algorithm is parity-tested in isolation (layers,
networks, losses, schedulers, evaluators). This test proves the whole:
N full cooperative iterations — teacher D/G updates, student D/G with
distillation, DARTS arch step with teacher-discrepancy EMA
(/root/reference/models/Pix2Pix.py:565-593, /root/reference/train.py:144-151)
— run in the jitted Pix2PixEngine and in the from-spec torch oracle
(benchmarks/torch_ref.py CooperativeBench) from IDENTICAL initial weights on
IDENTICAL batches, and the loss trajectories + final parameters must agree
to fp32 tolerance. This is the strongest correctness statement available
without the reference's pretrained weights/datasets: the training algorithm
is the reference's, iteration by iteration.

Config: tiny pruned student (cfg-driven widths), masked D, online teacher,
hinge GAN, reference lambdas (L1=100, content=50, gram=1e4), no dropout
(both sides deterministic), batch 2 at 32x32, num_downs=5.
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

from torch_ref import CooperativeBench, load_bench_from_jax_state  # noqa: E402

from gcc_tpu.config import Config  # noqa: E402
from gcc_tpu.engines.pix2pix import Pix2PixEngine  # noqa: E402

# pruned student widths (downs f0..f4, innermost up f5, ups f6..f8):
# exercises the cfg-driven topology on both sides, not just default widths
STUDENT_CFGS = [3, 6, 12, 20, 24, 20, 12, 6, 5]
N_ITERS = 4
LAMBDA_L1, LAMBDA_CONTENT, LAMBDA_GRAM = 100.0, 50.0, 1e4


def _np_tree(t):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), t)


@pytest.fixture(scope="module")
def trajectories():
    cfg = Config(model="pix2pix", ngf=4, ndf=8, teacher_ngf=8, teacher_ndf=8,
                 crop_size=32, num_downs=5, no_dropout=True, gan_mode="hinge",
                 online_distillation=True, darts_discriminator=True,
                 lambda_L1=LAMBDA_L1, lambda_content=LAMBDA_CONTENT,
                 lambda_gram=LAMBDA_GRAM, arch_lr=1e-4, lr=2e-4)
    eng = Pix2PixEngine(cfg, filter_cfgs=STUDENT_CFGS)
    state = eng.init_state(jax.random.PRNGKey(0), image_size=32)
    nets0 = _np_tree(state.nets)

    torch.manual_seed(0)
    bench = CooperativeBench(size=32, student_cfgs=STUDENT_CFGS, ngf=4,
                             ndf=8, teacher_ngf=8, teacher_ndf=8,
                             lambda_l1=LAMBDA_L1,
                             lambda_content=LAMBDA_CONTENT,
                             lambda_gram=LAMBDA_GRAM, num_downs=5,
                             use_dropout=False)
    load_bench_from_jax_state(bench, nets0)

    rng = np.random.RandomState(42)

    def mk():
        return (rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)

    t_hist, j_hist = [], []
    for _ in range(N_ITERS):
        A, B, Av, Bv = mk(), mk(), mk(), mk()
        t = bench.iteration(torch.tensor(np.transpose(A, (0, 3, 1, 2))),
                            torch.tensor(np.transpose(B, (0, 3, 1, 2))),
                            torch.tensor(np.transpose(Av, (0, 3, 1, 2))),
                            torch.tensor(np.transpose(Bv, (0, 3, 1, 2))),
                            ema_beta=0.9)
        t_hist.append(t)

        state, m1 = eng.train_step(
            state, {"A": jnp.asarray(A), "B": jnp.asarray(B)}, 2e-4)
        state, m2 = eng.arch_step(
            state, {"A": jnp.asarray(Av), "B": jnp.asarray(Bv)}, 0.9)
        j_hist.append({
            "D": float((m1["D_fake"] + m1["D_real"]) / 2),
            "G": float(m1["G_GAN"] + m1["G_L1"]
                       + m1["content"] + m1["gram"]),
            "content": float(m1["content"]) / LAMBDA_CONTENT,
            "gram": float(m1["gram"]) / LAMBDA_GRAM,
            "arch": float(m2["D_arch"]),
            "s_disc": float(m2["D_arch_diff"]),
            "ema": float(m2["teacher_D_arch_diff"]),
        })
    return bench, state, t_hist, j_hist


KEYS = ["D", "G", "content", "gram", "arch", "s_disc", "ema"]


def test_loss_trajectory_parity(trajectories):
    _, _, t_hist, j_hist = trajectories
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        for k in KEYS:
            print(f"iter {i} {k}: torch={t[k]:.6f} jax={j[k]:.6f} "
                  f"delta={abs(t[k] - j[k]):.2e}")
    for i, (t, j) in enumerate(zip(t_hist, j_hist)):
        for k in KEYS:
            tol = 1e-4 + 2e-3 * abs(t[k])
            assert abs(t[k] - j[k]) < tol, \
                f"iter {i} loss '{k}': torch {t[k]} vs jax {j[k]}"


def test_final_param_parity(trajectories):
    """After N iterations the two implementations' parameters coincide."""
    bench, state, _, _ = trajectories
    nets = _np_tree(state.nets)

    def close(torch_w, jax_w, name, perm=None, tol=5e-5):
        a = torch_w.detach().numpy()
        b = np.asarray(jax_w)
        if perm:
            b = np.transpose(b, perm)
        d = np.max(np.abs(a - b))
        print(f"{name}: max|delta| = {d:.2e}")
        assert d < tol, f"{name} diverged: {d}"

    # student G: every downconv + the outermost up
    g = nets["g"]["params"]
    for d in bench.sG.depths:
        close(bench.sG.downs[str(d)].weight, g[f"down_{d}"]["kernel"],
              f"sG.down_{d}", perm=(3, 2, 0, 1))
    close(bench.sG.ups["0"].weight, g["up_0"]["kernel"], "sG.up_0",
          perm=(2, 3, 0, 1))
    # teacher G innermost down (teacher trains too)
    close(bench.tG.downs["4"].weight, nets["tg"]["params"]["down_4"]["kernel"],
          "tG.down_4", perm=(3, 2, 0, 1))
    # student D conv + the DARTS mask alphas (the arch step's target)
    close(bench.sD.conv0.weight, nets["d"]["params"]["conv_0"]["kernel"],
          "sD.conv0", perm=(3, 2, 0, 1))
    close(bench.sD.mask0.alpha, nets["d"]["arch"]["mask_0"]["alpha"],
          "sD.alpha0")
    for i in range(3):
        close(bench.sD.masks[i].alpha,
              nets["d"]["arch"][f"mask_{i + 1}"]["alpha"], f"sD.alpha{i + 1}")
    # 1x1 distillation transforms (updated with G)
    for i, tr in enumerate(bench.transforms):
        close(tr.weight, nets["tf"]["params"][f"tf_{i}"]["kernel"],
              f"tf_{i}", perm=(3, 2, 0, 1))


def test_final_bn_stats_parity(trajectories):
    """Running BN statistics agree — pins per-forward update counts."""
    bench, state, _, _ = trajectories
    nets = _np_tree(state.nets)
    s = nets["d"]["batch_stats"]
    for i in range(3):
        a = bench.sD.norms[i].running_mean.detach().numpy()
        b = np.asarray(s[f"norm_{i + 1}"]["mean"])
        d = np.max(np.abs(a - b))
        print(f"sD.norm_{i + 1}.running_mean: max|delta| = {d:.2e}")
        assert d < 5e-5
        a = bench.sD.norms[i].running_var.detach().numpy()
        b = np.asarray(s[f"norm_{i + 1}"]["var"])
        assert np.max(np.abs(a - b)) < 5e-5
