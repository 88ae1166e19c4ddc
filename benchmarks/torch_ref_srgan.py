"""SRGAN cooperative-iteration parity oracle: the reference algorithm in
torch (CPU), built FROM THE BEHAVIORAL SPEC — no reference imports.

One reference iteration (models/SRGAN.py:297-560, train.py:144-151):
  teacher optimize (G-THEN-D, SRGAN.py:483-502, built with distill/darts
  off): single tG forward reused; backward_G = lambda_SR_content *
  MSE(fake, hr) + lambda_SR_adversarial * vanilla-BCE against tD — and it
  MUTATES real_hr/fake_hr to imagenet-norm in place (SRGAN.py:444-446),
  so the subsequent backward_D only ever sees imagenet-normalized images;
  D update real-first-then-fake (SRGAN.py:398-405). Teacher G targets are
  the hooks of the PRE-update forward; teacher D targets are the hooks of
  backward_D's LAST forward (the detached teacher fake).
  -> student G update (G-then-D): SR content on the [-1,1] tensors, then
     the same in-place imagenet mutation; student-D GAN term; distill =
     4x 1x1-transformed G feats + TEACHER-D feats of the student fake
     (NOT detached, SRGAN.py:459-461), sqrt(MSE) content/gram vs cloned
     teacher targets, + lambda_L1 * L1(fake_in, teacher fake_in.detach())
  -> student D update with DifferentiableOP alphas frozen
  -> DARTS arch step on a val batch (train.py:148-151): clip alphas FIRST,
     fresh G/tG forwards, teacher discrepancy |BCE(pf,True) - BCE(pf,False)|
     with zero-bootstrap EMA, arch loss |s_disc - ema| + D terms, alpha-only
     Adam(0.9, 0.999).

Optimizer scans (SRGAN.py:330-370): the student G group is the
named_modules() isinstance scan (Conv2d/BN/IN/ConvTranspose/Linear) plus
the 1x1 transforms — it EXCLUDES PReLU alphas (a reference accident; our
engine deliberately trains them, PARITY.md). include_prelu=True aligns the
oracle with the engine's documented deviation. The teacher uses plain
.parameters() (ALL params incl. PReLU). No duplicate params (unlike SAGAN).
All Adams are torch defaults (0.9, 0.999), lr; no TTUR.

Weights load from an SRGANEngine GANState via the strict-load export
mappings (gcc_tpu.utils.torch_export). Used by
tests/test_cooperative_parity_srgan.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def imagenet(x_m11):
    """[-1,1] NCHW -> imagenet-norm (data/sr_dataset.py:15-56)."""
    return ((x_m11 + 1.0) / 2.0 - _MEAN) / _STD


def bce(pred, target_is_real, for_discriminator=True):
    """GANLoss 'vanilla' (models/gan_loss.py spec): BCEWithLogits vs a
    broadcast 1/0 target; for_discriminator is a no-op for vanilla."""
    t = torch.ones_like(pred) if target_is_real else torch.zeros_like(pred)
    return F.binary_cross_entropy_with_logits(pred, t)


def gram(f):
    n, c, h, w = f.shape
    flat = f.reshape(n, c, h * w)
    return flat.bmm(flat.transpose(1, 2)) / (c * h * w)


class DictHooks:
    """Name-keyed forward hooks; overwritten per forward like the
    reference's total_*_features dicts (SRGAN.py:676-688)."""

    def __init__(self, named_modules):
        self.maps = {}
        for name, m in named_modules:
            m.register_forward_hook(self._mk(name))

    def _mk(self, name):
        def hook(_m, _i, out):
            self.maps[name] = out
        return hook

    def values(self):
        return list(self.maps.values())


G_EXTRACT = ["residual_blocks.3", "residual_blocks.7",
             "residual_blocks.11", "residual_blocks.15"]
D_EXTRACT = ["conv_blocks.1", "conv_blocks.3"]


class SRGANOracle:
    """Reference-layout torch nets + the full cooperative iteration."""

    def __init__(self, ngf=8, ndf=8, teacher_ngf=8, teacher_ndf=8,
                 filter_cfgs=None, lambda_sr_content=1.0,
                 lambda_sr_adversarial=1e-3, lambda_content=1.0,
                 lambda_gram=1.0, lambda_l1=1.0, lr=1e-4, arch_lr=1e-4,
                 include_prelu=False):
        from test_torch_parity import (TorchMaskOp, build_torch_srgan_d,
                                       build_torch_srresnet)
        self.lam = dict(sr_content=lambda_sr_content,
                        sr_adv=lambda_sr_adversarial,
                        content=lambda_content, gram=lambda_gram,
                        l1=lambda_l1)
        self.sG = build_torch_srresnet(ngf, n_blocks=16,
                                       filter_cfgs=filter_cfgs)
        self.sD = build_torch_srgan_d(ndf, masked=True)
        self.tG = build_torch_srresnet(teacher_ngf, n_blocks=16)
        self.tD = build_torch_srgan_d(teacher_ndf, masked=False)

        def pick(net, names):
            return [(n, m) for n, m in net.named_modules() if n in names]

        self.h_sG = DictHooks(pick(self.sG, G_EXTRACT))
        self.h_tG = DictHooks(pick(self.tG, G_EXTRACT))
        self.h_tD = DictHooks(pick(self.tD, D_EXTRACT))

        # 1x1 student->teacher transforms at the 4 extract layers
        # (SRGAN.py:337-347); all widths are the trunk nc on both sides
        self.transforms = nn.ModuleList(
            [nn.Conv2d(ngf, teacher_ngf, 1, bias=False) for _ in range(4)])

        # ---- student G optimizer: the reference isinstance scan ----
        match = (nn.Conv2d, nn.BatchNorm2d, nn.InstanceNorm2d,
                 nn.ConvTranspose2d, nn.Linear)
        netG_parms = []
        index = 0
        for name, module in self.sG.named_modules():
            if name in G_EXTRACT:
                netG_parms += list(self.transforms[index].parameters())
                index += 1
            if isinstance(module, match):
                netG_parms += list(module.parameters(recurse=False))
            elif include_prelu and isinstance(module, nn.PReLU):
                # engine deviation (PARITY.md): all G params train
                netG_parms += list(module.parameters(recurse=False))
        self.opt_g = torch.optim.Adam(netG_parms, lr)

        # ---- student D: weight scan + alpha scan (SRGAN.py:360-370) ----
        weight_params, arch_params = [], []
        for _name, module in self.sD.named_modules():
            if isinstance(module, match):
                weight_params += list(module.parameters(recurse=False))
            if isinstance(module, TorchMaskOp):
                arch_params += list(module.parameters(recurse=False))
        self.opt_d = torch.optim.Adam(weight_params, lr)
        self.opt_arch = torch.optim.Adam(arch_params, arch_lr)
        self.alphas = arch_params

        # ---- teacher: plain .parameters() (distill/darts off,
        # train.py:93-98 + SRGAN.py:328, 374-375) ----
        self.opt_tg = torch.optim.Adam(self.tG.parameters(), lr)
        self.opt_td = torch.optim.Adam(self.tD.parameters(), lr)
        self.ema = None

    @staticmethod
    def _grad(net, flag):
        for p in net.parameters():
            p.requires_grad_(flag)

    def _set_weight_grad(self, flag):
        for n, p in self.sD.named_parameters():
            if "alpha" not in n:
                p.requires_grad_(flag)

    def load_from_jax_state(self, nets):
        """GANState.nets snapshot (numpy pytrees) -> torch modules via the
        strict-load export mappings."""
        from gcc_tpu.utils import torch_export as te

        def load(mod, sd):
            t = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
            mod.load_state_dict(t, strict=True)

        load(self.sG, te.export_srresnet(
            nets["g"]["params"], nets["g"].get("batch_stats", {})))
        load(self.tG, te.export_srresnet(
            nets["tg"]["params"], nets["tg"].get("batch_stats", {})))
        load(self.sD, te.export_srgan_discriminator(
            nets["d"]["params"], nets["d"].get("batch_stats", {}),
            nets["d"].get("arch")))
        load(self.tD, te.export_srgan_discriminator(
            nets["td"]["params"], nets["td"].get("batch_stats", {})))
        with torch.no_grad():
            for i, conv in enumerate(self.transforms):
                conv.weight.copy_(torch.tensor(np.asarray(
                    nets["tf"]["params"][f"tf_{i}"]["kernel"])
                ).permute(3, 2, 0, 1))

    def iteration(self, lr_img, hr, lr_val, hr_val, ema_beta=0.9):
        lam = self.lam
        m = {}

        # ---- teacher optimize_parameters: G then D (SRGAN.py:483-502) ----
        tfake = self.tG(lr_img)
        t_gfeats = self.h_tG.values()  # pre-update forward hooks
        self._grad(self.tD, False)
        self.opt_tg.zero_grad()
        t_content = lam["sr_content"] * F.mse_loss(tfake, hr)
        hr_in = imagenet(hr)            # the reference's in-place mutation:
        tfake_in = imagenet(tfake)      # D only ever sees imagenet-norm
        t_gan = lam["sr_adv"] * bce(self.tD(tfake_in), True)
        (t_content + t_gan).backward()
        self.opt_tg.step()
        self._grad(self.tD, True)
        self.opt_td.zero_grad()
        pr = self.tD(hr_in)
        pf = self.tD(tfake_in.detach())  # hooks -> distill D-targets
        (bce(pr, True) + bce(pf, False)).backward()
        self.opt_td.step()
        targets = [f.detach() for f in t_gfeats + self.h_tD.values()]
        tfake_in_d = tfake_in.detach()

        # ---- student forward + G update (G-then-D, SRGAN.py:497-501) ----
        fake = self.sG(lr_img)
        s_gfeats = self.h_sG.values()
        self._grad(self.sD, False)
        self.opt_g.zero_grad()
        m["content"] = lam["sr_content"] * F.mse_loss(fake, hr)
        hr_in_s = imagenet(hr)
        fake_in = imagenet(fake)
        m["G_GAN"] = lam["sr_adv"] * bce(self.sD(fake_in), True)
        self.tD(fake_in)  # teacher-D feats of the student fake, NOT detached
        cur = [tr(f) for tr, f in zip(self.transforms, s_gfeats)] \
            + self.h_tD.values()
        d_content = gram_l = 0.0
        for f, t in zip(cur, targets):
            d_content = d_content + torch.sqrt(F.mse_loss(f, t))
            gram_l = gram_l + torch.sqrt(F.mse_loss(gram(f), gram(t)))
        m["distill_content"] = lam["content"] * d_content
        m["gram"] = lam["gram"] * gram_l
        m["L1"] = lam["l1"] * F.l1_loss(fake_in, tfake_in_d)
        (m["content"] + m["G_GAN"] + m["distill_content"] + m["gram"]
         + m["L1"]).backward()
        self.opt_g.step()
        self._grad(self.sD, True)

        # ---- student D update, alphas frozen (SRGAN.py:497-502) ----
        for a in self.alphas:
            a.requires_grad_(False)
        self.opt_d.zero_grad()
        pr = self.sD(hr_in_s)
        pf = self.sD(fake_in.detach())
        m["D_real"], m["D_fake"] = bce(pr, True), bce(pf, False)
        (m["D_real"] + m["D_fake"]).backward()
        self.opt_d.step()
        for a in self.alphas:
            a.requires_grad_(True)

        # ---- arch step on the val batch (train.py:148-151) ----
        with torch.no_grad():
            for a in self.alphas:
                a.clamp_(0.0, 1.0)
        fake_v = self.sG(lr_val)
        tfake_v = self.tG(lr_val)
        # teacher get_D_arch_diff(isTeacher=True), SRGAN.py:407-440
        self._grad(self.tD, False)
        tfake_v_in = imagenet(tfake_v)
        hr_v_in = imagenet(hr_val)
        pf = self.tD(tfake_v_in.detach())
        t_diff = torch.abs(bce(pf, True, for_discriminator=False)
                           - bce(pf, False))
        self.tD(hr_v_in)  # loss_D_arch_real computed but unused (teacher)
        self.ema = t_diff if self.ema is None \
            else ema_beta * t_diff + (1 - ema_beta) * self.ema
        self._grad(self.tD, True)
        # student arch backward: alphas only
        self._set_weight_grad(False)
        self.opt_arch.zero_grad()
        fake_v_in = imagenet(fake_v)
        pf = self.sD(fake_v_in.detach())
        l_fake = bce(pf, False)
        s_diff = torch.abs(bce(pf, True, for_discriminator=False) - l_fake)
        pr = self.sD(hr_v_in)
        l_real = bce(pr, True)
        loss_arch = torch.abs(s_diff - self.ema.detach()) + l_real + l_fake
        loss_arch.backward()
        self.opt_arch.step()
        self._set_weight_grad(True)

        out = {k: float(v.detach()) for k, v in m.items()}
        out.update({"D_arch": float(loss_arch.detach()),
                    "D_arch_diff": float(s_diff.detach()),
                    "teacher_D_arch_diff": float(self.ema)})
        return out
