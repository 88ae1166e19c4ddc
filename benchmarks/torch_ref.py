"""Measured reference baseline: the GCC pix2pix cooperative iteration in
torch (CPU), built FROM THE BEHAVIORAL SPEC — no reference imports.

This reproduces the reference's full per-iteration work (train.py:144-151):
  teacher G forward -> teacher D update -> teacher G update (+ L1, hooks)
  -> student G forward -> student D update -> student G update with
  distillation (1x1 transforms, content + gram sqrt-MSE vs teacher features)
  -> DARTS arch step on a validation batch (clip alphas, teacher-discrepancy
  EMA, L1 + D GAN terms, alpha-only Adam)
with the reference's single-forward-per-net dataflow (fake_B computed once,
reused by backward_D via .detach() and by backward_G with the graph kept —
models/Pix2Pix.py:460-583).

Purpose: an auditable, *measured* torch throughput anchor for bench.py's
vs_baseline, replacing round 1's invented V100 constant. Run:

    python benchmarks/torch_ref.py [--steps 3] [--batch 1] [--size 256]

writes benchmarks/torch_ref_result.json with full provenance; bench.py reads
it if present.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import platform
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Networks from spec
# ---------------------------------------------------------------------------

class _MaskSTE(torch.autograd.Function):
    """DifferentiableOP mask: (sign(alpha - t) + 1)/2, straight-through
    gradient to alpha (models/DifferentiableOp.py:22-32; sign(0) -> 1/2)."""

    @staticmethod
    def forward(ctx, alpha, threshold):
        return (torch.sign(alpha - threshold) + 1.0) / 2.0

    @staticmethod
    def backward(ctx, g):
        return g, None


class MaskGate(nn.Module):
    def __init__(self, ch, threshold=0.5):
        super().__init__()
        self.alpha = nn.Parameter(torch.full((ch,), 0.75))
        self.threshold = threshold

    def forward(self, x):  # NCHW
        m = _MaskSTE.apply(self.alpha, self.threshold)
        return x * m[None, :, None, None]


def _exists(f, depth, n):
    if depth == n - 1:
        return f[n - 1] != 0 and f[n] != 0
    if 4 <= depth <= n - 2:
        return f[depth] != 0 and f[2 * n - 1 - depth] != 0
    return True


class Unet(nn.Module):
    """Loop-form cfg-driven U-Net (spec: Pix2Pix.py:79-130). Captures the 4
    reference hook features into self.feats each forward (hooks on
    down-norms at depths 1/3 and the up-relus at depths 3/1,
    Pix2Pix.py:366-369)."""

    def __init__(self, ngf=64, num_downs=8, filter_cfgs=None,
                 use_dropout=True, in_ch=3, out_ch=3):
        super().__init__()
        n = self.n = num_downs
        self.use_dropout = use_dropout
        if filter_cfgs is None:
            filter_cfgs = [ngf * min(2 ** k, 8) for k in range(n)] + \
                [ngf * min(2 ** (k - 1), 8) for k in range(n - 1, 0, -1)]
        f = self.f = list(filter_cfgs)
        self.depths = [d for d in range(n) if _exists(f, d, n)]
        self.downs = nn.ModuleDict()
        self.down_norms = nn.ModuleDict()
        self.ups = nn.ModuleDict()
        self.up_norms = nn.ModuleDict()
        cin = in_ch
        for d in self.depths:
            self.downs[str(d)] = nn.Conv2d(cin, f[d], 4, 2, 1, bias=False)
            if d != 0 and d != n - 1:
                self.down_norms[str(d)] = nn.BatchNorm2d(f[d])
            cin = f[d]
        # decoder: innermost up input is the deepest down output
        up_in = f[self.depths[-1]]
        for d in reversed(self.depths):
            if d == 0:
                self.ups["0"] = nn.ConvTranspose2d(up_in, out_ch, 4, 2, 1)
                break
            uo = f[2 * n - 1 - d]
            self.ups[str(d)] = nn.ConvTranspose2d(up_in, uo, 4, 2, 1,
                                                  bias=False)
            self.up_norms[str(d)] = nn.BatchNorm2d(uo)
            shallower = max(dd for dd in self.depths if dd < d)
            up_in = f[shallower] + uo

    def forward(self, x):
        n = self.n
        self.feats = []
        skips = {}
        h = x
        for d in self.depths:
            if d > 0:
                h = F.leaky_relu(h, 0.2)
            h = self.downs[str(d)](h)
            if str(d) in self.down_norms:
                h = self.down_norms[str(d)](h)
                if d in (1, 3):
                    self.feats.append(h)
            skips[d] = h
        g2 = g3 = None
        for d in reversed(self.depths):
            h = F.relu(h)
            if d == 3:
                g2 = h
            if d == 1:
                g3 = h
            if d == 0:
                out = torch.tanh(self.ups["0"](h))
                if g2 is not None:
                    self.feats.append(g2)
                if g3 is not None:
                    self.feats.append(g3)
                return out
            h2 = self.up_norms[str(d)](self.ups[str(d)](h))
            if self.use_dropout and 4 <= d <= n - 2:
                h2 = F.dropout(h2, 0.5, training=self.training)
            shallower = max(dd for dd in self.depths if dd < d)
            h = torch.cat([skips[shallower], h2], 1)
        raise AssertionError("unreachable")


class PatchGAN(nn.Module):
    """NLayerDiscriminator / MaskNLayerDiscriminator (Pix2Pix.py:267-348).
    Captures post-norm features of stages 1 and 3 into self.feats."""

    def __init__(self, ndf=64, in_ch=6, masked=False, n_layers=3):
        super().__init__()
        self.masked = masked
        self.n_layers = n_layers
        self.conv0 = nn.Conv2d(in_ch, ndf, 4, 2, 1)
        if masked:
            self.mask0 = MaskGate(ndf)
        self.convs = nn.ModuleList()
        self.norms = nn.ModuleList()
        self.masks = nn.ModuleList()
        nf = 1
        for i in range(1, n_layers + 1):
            nf_prev, nf = nf, min(2 ** i, 8)
            stride = 2 if i < n_layers else 1
            self.convs.append(nn.Conv2d(ndf * nf_prev, ndf * nf, 4, stride,
                                        1, bias=False))
            self.norms.append(nn.BatchNorm2d(ndf * nf))
            if masked:
                self.masks.append(MaskGate(ndf * nf))
        self.conv_out = nn.Conv2d(ndf * nf, 1, 4, 1, 1)

    def forward(self, x):
        self.feats = []
        h = F.leaky_relu(self.conv0(x), 0.2)
        if self.masked:
            h = self.mask0(h)
        for i in range(self.n_layers):
            h = self.norms[i](self.convs[i](h))
            if i + 1 in (1, self.n_layers):
                self.feats.append(h)
            if self.masked:
                h = self.masks[i](h)
            h = F.leaky_relu(h, 0.2)
        return self.conv_out(h)


# ---------------------------------------------------------------------------
# Losses (GANLoss.py:38-59 hinge; gram/content Pix2Pix.py:528-548)
# ---------------------------------------------------------------------------

def hinge_loss(pred, target_is_real, for_discriminator=True):
    if for_discriminator:
        if target_is_real:
            return F.relu(1.0 - pred).mean()
        return F.relu(1.0 + pred).mean()
    return -pred.mean()


def gram(f):
    n, c, h, w = f.shape
    flat = f.reshape(n, c, h * w)
    return flat.bmm(flat.transpose(1, 2)) / (c * h * w)


def distill_terms(feats, targets):
    content = 0.0
    gram_l = 0.0
    for f, t in zip(feats, targets):
        content = content + torch.sqrt(F.mse_loss(f, t))
        gram_l = gram_l + torch.sqrt(F.mse_loss(gram(f), gram(t)))
    return content, gram_l


def discrepancy(pred_fake):
    return (hinge_loss(pred_fake, True, for_discriminator=False)
            - hinge_loss(pred_fake, False, for_discriminator=True)).abs()


# ---------------------------------------------------------------------------
# Cooperative iteration
# ---------------------------------------------------------------------------

class CooperativeBench:
    """Teacher + pruned student + masked D + transforms, one reference
    iteration per call (train.py:144-151 / Pix2Pix.py:565-593)."""

    def __init__(self, size=256, student_cfgs=None, ngf=32, ndf=128,
                 teacher_ngf=64, teacher_ndf=128, lambda_l1=100.0,
                 lambda_content=50.0, lambda_gram=1e4, num_downs=8,
                 use_dropout=True):
        self.size = size
        self.lambda_l1 = lambda_l1
        self.lambda_content = lambda_content
        self.lambda_gram = lambda_gram
        self.tG = Unet(teacher_ngf, num_downs, use_dropout=use_dropout)
        self.tD = PatchGAN(teacher_ndf)
        self.sG = Unet(ngf, num_downs, filter_cfgs=student_cfgs,
                       use_dropout=use_dropout)
        self.sD = PatchGAN(ndf, masked=True)
        # 1x1 student->teacher transforms (Pix2Pix.py:402-415): widths of the
        # teacher's 4 hook features
        t_widths = (teacher_ngf * 2, teacher_ngf * 8, teacher_ngf * 16,
                    teacher_ngf * 4)
        with torch.no_grad():
            dummy = torch.zeros(1, 3, size, size)
            self.sG.eval()
            self.sG(dummy)
            s_widths = [f.shape[1] for f in self.sG.feats]
            self.sG.train()
        self.transforms = nn.ModuleList(
            [nn.Conv2d(s, t, 1, bias=False)
             for s, t in zip(s_widths, t_widths)])

        self.opt_tG = torch.optim.Adam(self.tG.parameters(), 2e-4,
                                       betas=(0.5, 0.999))
        self.opt_tD = torch.optim.Adam(self.tD.parameters(), 2e-4,
                                       betas=(0.5, 0.999))
        g_params = list(self.sG.parameters()) \
            + list(self.transforms.parameters())
        self.opt_G = torch.optim.Adam(g_params, 2e-4, betas=(0.5, 0.999))
        d_params = [p for n_, p in self.sD.named_parameters()
                    if "alpha" not in n_]
        self.alphas = [p for n_, p in self.sD.named_parameters()
                       if "alpha" in n_]
        self.opt_D = torch.optim.Adam(d_params, 2e-4, betas=(0.5, 0.999))
        self.opt_arch = torch.optim.Adam(self.alphas, 1e-4)
        self.ema = None

    @staticmethod
    def _set_grad(params, flag):
        for p in params:
            p.requires_grad_(flag)

    def iteration(self, A, B, A_val, B_val, ema_beta=0.9):
        # ---- teacher step (D-then-G, one G forward) ----
        tfake = self.tG(A)
        t_g_feats = [f.clone() for f in self.tG.feats]
        self.opt_tD.zero_grad()
        loss_tD = (hinge_loss(self.tD(torch.cat([A, tfake.detach()], 1)),
                              False)
                   + hinge_loss(self.tD(torch.cat([A, B], 1)), True)) * 0.5
        loss_tD.backward()
        self.opt_tD.step()
        self._set_grad(self.tD.parameters(), False)
        self.opt_tG.zero_grad()
        pf = self.tD(torch.cat([A, tfake], 1))
        t_d_feats = [f.clone() for f in self.tD.feats]
        loss_tG = hinge_loss(pf, True, for_discriminator=False) \
            + self.lambda_l1 * F.l1_loss(tfake, B)
        loss_tG.backward()
        self.opt_tG.step()
        self._set_grad(self.tD.parameters(), True)
        targets = [t.detach() for t in t_g_feats + t_d_feats]

        # ---- student D step ----
        fake = self.sG(A)
        s_g_feats = list(self.sG.feats)
        self._set_grad(self.alphas, False)
        self.opt_D.zero_grad()
        lossD = (hinge_loss(self.sD(torch.cat([A, fake.detach()], 1)), False)
                 + hinge_loss(self.sD(torch.cat([A, B], 1)), True)) * 0.5
        lossD.backward()
        self.opt_D.step()

        # ---- student G step (distillation through teacher D) ----
        self._set_grad(self.sD.parameters(), False)
        self._set_grad(self.tD.parameters(), False)
        self.opt_G.zero_grad()
        pf = self.sD(torch.cat([A, fake], 1))
        self.tD(torch.cat([A, fake], 1))
        s_feats = [tr(f) for tr, f in zip(self.transforms, s_g_feats)] \
            + list(self.tD.feats)
        content, gram_l = distill_terms(s_feats, targets)
        lossG = hinge_loss(pf, True, for_discriminator=False) \
            + self.lambda_l1 * F.l1_loss(fake, B) \
            + self.lambda_content * content + self.lambda_gram * gram_l
        lossG.backward()
        self.opt_G.step()
        self._set_grad(self.sD.parameters(), True)
        self._set_grad(self.tD.parameters(), True)
        self._set_grad(self.alphas, True)

        # ---- arch step on the validation batch (train.py:147-151) ----
        with torch.no_grad():
            for a in self.alphas:
                a.clamp_(0.0, 1.0)
            vfake = self.sG(A_val)
            tvfake = self.tG(A_val)
            t_disc = discrepancy(self.tD(torch.cat([A_val, tvfake], 1)))
            self.tD(torch.cat([A_val, B_val], 1))  # BN-stat parity
            self.ema = t_disc if self.ema is None \
                else ema_beta * t_disc + (1 - ema_beta) * self.ema
        self._set_grad([p for n_, p in self.sD.named_parameters()
                        if "alpha" not in n_], False)
        self.opt_arch.zero_grad()
        pf = self.sD(torch.cat([A_val, vfake], 1))
        s_disc = discrepancy(pf)
        pr = self.sD(torch.cat([A_val, B_val], 1))
        loss_arch = (s_disc - self.ema).abs() \
            + (hinge_loss(pr, True) + hinge_loss(pf, False)) * 0.5
        loss_arch.backward()
        self.opt_arch.step()
        self._set_grad([p for n_, p in self.sD.named_parameters()
                        if "alpha" not in n_], True)

        return {"D": float(lossD.detach()), "G": float(lossG.detach()),
                "content": float(content.detach()),
                "gram": float(gram_l.detach()),
                "tD": float(loss_tD.detach()), "tG": float(loss_tG.detach()),
                "arch": float(loss_arch.detach()),
                "s_disc": float(s_disc.detach()),
                "ema": float(self.ema)}


# ---------------------------------------------------------------------------
# Parity-oracle weight loading: GCC-TPU GANState -> these torch modules.
#
# Inverse layout transposes (gcc_tpu/utils/torch_port.py docstring):
#   HWIO conv kernel                 -> torch Conv2d (O,I,H,W):       (3,2,0,1)
#   HWIO forward-kernel of deconv    -> torch ConvTranspose2d (I,O,H,W): (2,3,0,1)
# ---------------------------------------------------------------------------

def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _load_bn(bn, p, s):
    with torch.no_grad():
        bn.weight.copy_(_t(p["scale"]))
        bn.bias.copy_(_t(p["bias"]))
        bn.running_mean.copy_(_t(s["mean"]))
        bn.running_var.copy_(_t(s["var"]))


def load_unet_from_jax(unet: "Unet", variables: dict) -> None:
    """Copy a gcc_tpu UnetGenerator variable dict into the loop-form Unet."""
    p, s = variables["params"], variables.get("batch_stats", {})
    with torch.no_grad():
        for d in unet.depths:
            unet.downs[str(d)].weight.copy_(
                _t(p[f"down_{d}"]["kernel"]).permute(3, 2, 0, 1))
            if str(d) in unet.down_norms:
                _load_bn(unet.down_norms[str(d)], p[f"down_norm_{d}"],
                         s[f"down_norm_{d}"])
            if d == 0:
                unet.ups["0"].weight.copy_(
                    _t(p["up_0"]["kernel"]).permute(2, 3, 0, 1))
                unet.ups["0"].bias.copy_(_t(p["up_0"]["bias"]))
            else:
                unet.ups[str(d)].weight.copy_(
                    _t(p[f"up_{d}"]["kernel"]).permute(2, 3, 0, 1))
                _load_bn(unet.up_norms[str(d)], p[f"up_norm_{d}"],
                         s[f"up_norm_{d}"])


def load_patchgan_from_jax(pg: "PatchGAN", variables: dict) -> None:
    p, s = variables["params"], variables.get("batch_stats", {})
    arch = variables.get("arch")
    with torch.no_grad():
        pg.conv0.weight.copy_(_t(p["conv_0"]["kernel"]).permute(3, 2, 0, 1))
        pg.conv0.bias.copy_(_t(p["conv_0"]["bias"]))
        for i in range(pg.n_layers):
            pg.convs[i].weight.copy_(
                _t(p[f"conv_{i + 1}"]["kernel"]).permute(3, 2, 0, 1))
            _load_bn(pg.norms[i], p[f"norm_{i + 1}"], s[f"norm_{i + 1}"])
        pg.conv_out.weight.copy_(
            _t(p["conv_out"]["kernel"]).permute(3, 2, 0, 1))
        pg.conv_out.bias.copy_(_t(p["conv_out"]["bias"]))
        if pg.masked and arch is not None:
            pg.mask0.alpha.copy_(_t(arch["mask_0"]["alpha"]))
            for i in range(pg.n_layers):
                pg.masks[i].alpha.copy_(_t(arch[f"mask_{i + 1}"]["alpha"]))


def load_bench_from_jax_state(bench: "CooperativeBench", nets: dict) -> None:
    """Load all five nets of a Pix2PixEngine GANState.nets snapshot (numpy
    pytrees) into the bench: student G/D, teacher G/D, 1x1 transforms."""
    load_unet_from_jax(bench.sG, nets["g"])
    load_patchgan_from_jax(bench.sD, nets["d"])
    load_unet_from_jax(bench.tG, nets["tg"])
    load_patchgan_from_jax(bench.tD, nets["td"])
    with torch.no_grad():
        for i, tr in enumerate(bench.transforms):
            tr.weight.copy_(
                _t(nets["tf"]["params"][f"tf_{i}"]["kernel"]
                   ).permute(3, 2, 0, 1))


def derive_student_cfgs(size=256, ngf=32, num_downs=8):
    """Same pruned-student derivation bench.py uses (3.0 GMACs budget)."""
    import jax
    import jax.numpy as jnp
    from gcc_tpu.compress import prune_unet
    from gcc_tpu.models.generators import UnetGenerator

    rng_np = np.random.RandomState(0)
    g_full = UnetGenerator(ngf=ngf, num_downs=num_downs)
    shapes = jax.eval_shape(
        lambda k: g_full.init({"params": k, "dropout": k},
                              jnp.zeros((1, size, size, 3))),
        jax.random.PRNGKey(0))["params"]
    params = jax.tree_util.tree_map(
        lambda s: (rng_np.rand(*s.shape).astype(np.float32)
                   * np.exp(rng_np.uniform(-6, 2, s.shape[-1])
                            ).astype(np.float32)), shapes)
    fc, _, _ = prune_unet(params, mode="scale", ngf=ngf,
                          target_budget_g=3.0, tolerance_g=0.1,
                          num_downs=num_downs, image_size=size)
    return fc


def measure(steps=3, warmup=1, batch=1, size=256, student_cfgs=None,
            seed=0, num_downs=8, **bench_kw) -> dict:
    torch.manual_seed(seed)
    if student_cfgs is None and size == 256:
        student_cfgs = derive_student_cfgs(size=size, num_downs=num_downs)
    bench = CooperativeBench(size=size, student_cfgs=student_cfgs,
                             num_downs=num_downs, **bench_kw)
    rng = np.random.RandomState(seed)

    def mk():
        return torch.tensor(rng.rand(batch, 3, size, size).astype(np.float32)
                            * 2 - 1)

    A, B, Av, Bv = mk(), mk(), mk(), mk()
    for _ in range(warmup):
        bench.iteration(A, B, Av, Bv)
    t0 = time.perf_counter()
    for _ in range(steps):
        m = bench.iteration(A, B, Av, Bv)
    dt = time.perf_counter() - t0
    return {
        "imgs_per_sec": batch * steps / dt,
        "sec_per_iter": dt / steps,
        "batch": batch, "size": size, "steps": steps,
        "losses_last": m,
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "note": ("reference GCC pix2pix cooperative iteration "
                 "(teacher+student+distill+arch), torch CPU, from spec"),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "torch_ref_result.json"))
    args = p.parse_args()
    res = measure(args.steps, args.warmup, args.batch, args.size)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
