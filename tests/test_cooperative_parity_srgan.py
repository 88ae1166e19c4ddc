"""Composed cooperative-iteration parity for the SRGAN family — completes
the 4/4 composed-algorithm matrix (pix2pix, cyclegan, sagan, srgan).

Structural variants this one pins: G-THEN-D update order, vanilla-BCE GAN,
the reference's in-place imagenet-norm mutation (its D only ever sees
imagenet-normalized images, models/SRGAN.py:444-446), SR-content +
adversarial + distillation composition, teacher-D-features-on-student-fake
NOT detached, cfg-driven pruned residual widths, masked D with
adaptive-pool + linear head, plain Adam (0.9, 0.999) with no TTUR and no
duplicate param groups (contrast SAGAN).

The oracle (benchmarks/torch_ref_srgan.py) runs include_prelu=True: the
reference's student-G optimizer scan accidentally omits PReLU alphas
(SRGAN.py:342-352 isinstance filter); the engine deliberately trains all
generator params (documented deviation, PARITY.md / engines/srgan.py:22-25),
so the oracle is aligned to the engine's documented behavior.

No spectral norm and healthy gradient scales -> pix2pix-grade tolerances
(cf. tests/test_cooperative_parity.py), not the chaos-widened SAGAN ones.
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

from torch_ref_srgan import SRGANOracle  # noqa: E402

from gcc_tpu.config import Config  # noqa: E402
from gcc_tpu.engines.srgan import SRGANEngine  # noqa: E402

N_ITERS = 4
LR = 1e-4
# pruned inner widths for the 16 residual blocks (cfg-driven topology on
# both sides; trunk stays ngf)
STUDENT_CFGS = [4, 6, 8, 4, 6, 8, 4, 6, 8, 4, 6, 8, 4, 6, 8, 4]
LAMS = dict(lambda_SR_content=1.0, lambda_SR_adversarial=1e-3,
            lambda_SR_perceptual=0.0, lambda_content=1.0,
            lambda_gram=1.0, lambda_L1=1.0)


def _np_tree(t):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), t)


@pytest.fixture(scope="module")
def trajectories():
    cfg = Config(model="srgan", ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                 image_size=32, upscale_factor=4, gan_mode="vanilla",
                 online_distillation=True, darts_discriminator=True,
                 lr=LR, arch_lr=1e-4, **LAMS)
    eng = SRGANEngine(cfg, filter_cfgs=STUDENT_CFGS)
    state = eng.init_state(jax.random.PRNGKey(3))
    nets0 = _np_tree(state.nets)

    torch.manual_seed(0)
    oracle = SRGANOracle(ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                         filter_cfgs=STUDENT_CFGS,
                         lambda_sr_content=1.0, lambda_sr_adversarial=1e-3,
                         lambda_content=1.0, lambda_gram=1.0, lambda_l1=1.0,
                         lr=LR, arch_lr=1e-4, include_prelu=True)
    oracle.load_from_jax_state(nets0)

    rng = np.random.RandomState(5)

    def mk():
        hr = (rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
        lr_img = (rng.rand(2, 8, 8, 3).astype(np.float32) * 2 - 1)
        return lr_img, hr

    t_hist, j_hist = [], []
    for _ in range(N_ITERS):
        (lr_t, hr_t), (lr_v, hr_v) = mk(), mk()
        t = oracle.iteration(
            torch.tensor(np.transpose(lr_t, (0, 3, 1, 2))),
            torch.tensor(np.transpose(hr_t, (0, 3, 1, 2))),
            torch.tensor(np.transpose(lr_v, (0, 3, 1, 2))),
            torch.tensor(np.transpose(hr_v, (0, 3, 1, 2))), ema_beta=0.9)
        t_hist.append(t)

        state, m1 = eng.train_step(
            state, {"lr": jnp.asarray(lr_t), "hr": jnp.asarray(hr_t)}, LR)
        state, m2 = eng.arch_step(
            state, {"lr": jnp.asarray(lr_v), "hr": jnp.asarray(hr_v)}, 0.9)
        j_hist.append({k: float(v) for k, v in {**m1, **m2}.items()})
    return oracle, state, t_hist, j_hist


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
            tol = 1e-4 + 2e-3 * abs(t[k])
            assert abs(t[k] - j[k]) < tol, \
                f"iter {i} loss '{k}': torch {t[k]} vs jax {j[k]}"


def test_final_param_parity(trajectories):
    oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)

    def close(torch_w, jax_w, name, perm=None, tol=5e-5):
        a = torch_w.detach().numpy()
        b = np.asarray(jax_w)
        if perm:
            b = np.transpose(b, perm)
        d = np.max(np.abs(a - b))
        print(f"{name}: max|delta| = {d:.2e}")
        assert d < tol, f"{name} diverged: {d}"

    g = nets["g"]["params"]
    close(oracle.sG.conv_block1.conv_block[0].weight, g["conv_in"]["kernel"],
          "sG.conv_in", perm=(3, 2, 0, 1))
    # the engine's documented deviation trains this; include_prelu aligns
    close(oracle.sG.conv_block1.conv_block[1].weight,
          g["prelu_in"]["alpha"].reshape(1), "sG.prelu_in")
    close(oracle.sG.residual_blocks[5].conv_block1.conv_block[0].weight,
          g["block_5_conv1"]["kernel"], "sG.block5.conv1", perm=(3, 2, 0, 1))
    close(oracle.sG.residual_blocks[5].conv_block2.conv_block[0].weight,
          g["block_5_conv2"]["kernel"], "sG.block5.conv2", perm=(3, 2, 0, 1))
    close(oracle.sG.conv_block2.conv_block[0].weight,
          g["conv_mid"]["kernel"], "sG.conv_mid", perm=(3, 2, 0, 1))
    close(oracle.sG.subpixel_convolutional_blocks[0].conv.weight,
          g["subpixel_0"]["conv"]["kernel"], "sG.subpixel0",
          perm=(3, 2, 0, 1))
    close(oracle.sG.conv_block3.conv_block[0].weight,
          g["conv_out"]["kernel"], "sG.conv_out", perm=(3, 2, 0, 1))
    # teacher G trains too (incl. PReLU via plain .parameters())
    close(oracle.tG.conv_block1.conv_block[0].weight,
          nets["tg"]["params"]["conv_in"]["kernel"], "tG.conv_in",
          perm=(3, 2, 0, 1))
    close(oracle.tG.residual_blocks[3].conv_block1.conv_block[2].weight,
          nets["tg"]["params"]["block_3_prelu"]["alpha"].reshape(1),
          "tG.block3.prelu")
    # student D convs + head + DARTS alphas
    d = nets["d"]["params"]
    close(oracle.sD.conv_blocks[0].conv_block[0].weight,
          d["conv_0"]["kernel"], "sD.conv0", perm=(3, 2, 0, 1))
    close(oracle.sD.conv_blocks[2].conv_block[0].weight,
          d["conv_2"]["kernel"], "sD.conv2", perm=(3, 2, 0, 1))
    close(oracle.sD.fc1.weight, np.transpose(np.asarray(d["fc"]["kernel"])),
          "sD.fc1")
    for i in range(4):
        oi = 1 if i == 0 else 2
        close(oracle.sD.conv_blocks[i].conv_block[oi].alpha,
              nets["d"]["arch"][f"mask_{i}"]["alpha"], f"sD.alpha{i}",
              tol=1e-5)
    # teacher D
    close(oracle.tD.conv_blocks[1].conv_block[0].weight,
          nets["td"]["params"]["conv_1"]["kernel"], "tD.conv1",
          perm=(3, 2, 0, 1))
    # 1x1 transforms (updated with G)
    for i, tr in enumerate(oracle.transforms):
        close(tr.weight, nets["tf"]["params"][f"tf_{i}"]["kernel"],
              f"tf_{i}", perm=(3, 2, 0, 1))


def test_final_bn_stats_parity(trajectories):
    """Running BN statistics agree — pins per-forward stats-update counts
    (student G: 2/iter — train + arch forwards; student D: 5/iter;
    teacher D: 6/iter including the student-fake feature forward).

    Tolerances by measured root cause: a conv BIAS feeding a train-mode
    BatchNorm has mathematically zero gradient (BN subtracts the batch
    mean), so fp32 cross-framework noise decides the sign of Adam's
    normalized step and those biases random-walk at +-lr per update —
    forward-inert (train BN absorbs them; losses here stay exact to 1e-7)
    but the running MEAN tracks the conv output incl. bias and inherits
    the walk (localized diagnostic: after iteration 1, tD conv_1 bias
    differs by 1.8e-4 = the exact norm_1 running-mean delta, while its
    kernel matches to 1e-7). Mean bound = 2*lr*N_ITERS*1.25 = 1e-3; a
    missing/extra stats update would shift the mean by O(batch mean)
    ~3e-2, far above it. Running VAR is exactly invariant to a bias shift
    — 1e-4 keeps it pinned tight."""
    oracle, state, _, _ = trajectories
    nets = _np_tree(state.nets)
    mean_tol = 2 * LR * N_ITERS * 1.25
    for blk in (2, 9):
        bn = oracle.sG.residual_blocks[blk].conv_block1.conv_block[1]
        b = np.asarray(
            nets["g"]["batch_stats"][f"block_{blk}_bn1"]["mean"])
        dm = np.max(np.abs(bn.running_mean.detach().numpy() - b))
        print(f"sG.block{blk}.bn1.running_mean: {dm:.2e}")
        assert dm < mean_tol
        b = np.asarray(nets["g"]["batch_stats"][f"block_{blk}_bn1"]["var"])
        assert np.max(np.abs(bn.running_var.detach().numpy() - b)) < 1e-4
    for tag, net, node in (("sD", oracle.sD, nets["d"]),
                           ("tD", oracle.tD, nets["td"])):
        for i in (1, 3):
            bn = net.conv_blocks[i].conv_block[1]
            b = np.asarray(node["batch_stats"][f"norm_{i}"]["mean"])
            dm = np.max(np.abs(bn.running_mean.detach().numpy() - b))
            b = np.asarray(node["batch_stats"][f"norm_{i}"]["var"])
            dv = np.max(np.abs(bn.running_var.detach().numpy() - b))
            print(f"{tag}.norm_{i}: mean {dm:.2e} var {dv:.2e}")
            assert dm < mean_tol, f"{tag}.norm_{i} mean {dm}"
            assert dv < 1e-4, f"{tag}.norm_{i} var {dv}"


def test_reference_mode_freezes_prelu():
    """Pins the reference accident the engine deviates from: with the
    reference's optimizer scan (include_prelu=False, SRGAN.py:342-352's
    isinstance filter), student-G PReLU alphas receive NO updates across a
    full iteration while every conv kernel moves; include_prelu=True (the
    engine-aligned mode used by the parity fixture) trains them."""
    torch.manual_seed(1)
    oracle = SRGANOracle(ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                         lr=1e-3, include_prelu=False)
    a0 = oracle.sG.conv_block1.conv_block[1].weight.detach().clone()
    k0 = oracle.sG.conv_block1.conv_block[0].weight.detach().clone()
    ta0 = oracle.tG.conv_block1.conv_block[1].weight.detach().clone()
    rng = np.random.RandomState(9)
    hr = torch.tensor(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    lr_img = torch.tensor(rng.rand(2, 3, 8, 8).astype(np.float32) * 2 - 1)
    oracle.iteration(lr_img, hr, lr_img, hr)
    a1 = oracle.sG.conv_block1.conv_block[1].weight.detach()
    k1 = oracle.sG.conv_block1.conv_block[0].weight.detach()
    ta1 = oracle.tG.conv_block1.conv_block[1].weight.detach()
    assert torch.equal(a0, a1), "reference mode must freeze student PReLU"
    assert not torch.equal(k0, k1), "conv kernels must train"
    # the teacher uses plain .parameters(): its PReLU DOES train
    assert not torch.equal(ta0, ta1), "teacher PReLU must train"
