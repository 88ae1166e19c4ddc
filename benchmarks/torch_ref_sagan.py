"""SAGAN cooperative-iteration parity oracle: the reference algorithm in
torch (CPU), built FROM THE BEHAVIORAL SPEC — no reference imports.

One reference iteration (models/SAGAN.py:364-535, train.py:144-151):
  teacher optimize (D-THEN-G, SAGAN.py:507-525): single tG forward reused;
  D hinge update at lr*4 (real first, then detached fake, unhalved sum);
  G hinge update against the POST-update D — that tD(tfake) forward is the
  one whose hook features become the distillation D-targets
  -> student D update (same order/TTUR) with the reference's DOUBLE-ADDED
     param group: the named_modules() scan (SAGAN.py:339-346) appends
     SpectralNorm-wrapped conv params twice (wrapper + inner module) and
     attention q/k/v convs twice (Self_Attn + inner Conv2d); torch applies
     one Adam update per occurrence
  -> student G update (same duplicate scan, SAGAN.py:315-327): hinge G +
     sqrt(MSE) content/gram over [2 transformed G feats + teacher-D feats
     of the student fake (NOT detached — grads flow through the frozen
     teacher D, SAGAN.py:468)] + lambda_L1 * L1(fake, teacher fake)
  -> DARTS arch step on a val batch (SAGAN.py:388-418, 527-535): teacher
     discrepancy EMA with zero-bootstrap, |student disc - EMA| + UNHALVED
     D hinge terms, alpha-only Adam(0.9, 0.999).

Weights load from a SAGANEngine GANState via the strict-load export
mappings (gcc_tpu.utils.torch_export) into reference-layout torch modules
(the same from-spec builders the export-parity tests pin). u/v spectral
vectors are non-trainable Parameters riding in the optimizer groups with
no gradient, exactly as in the reference (SAGAN.py:53-54).
Used by tests/test_cooperative_parity_sagan.py.
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


def hinge_d_real(pred):
    return -torch.mean(torch.min(pred - 1, torch.zeros_like(pred)))


def hinge_d_fake(pred):
    return -torch.mean(torch.min(-pred - 1, torch.zeros_like(pred)))


def hinge_g(pred):
    return -torch.mean(pred)


def gram(f):
    n, c, h, w = f.shape
    flat = f.reshape(n, c, h * w)
    return flat.bmm(flat.transpose(1, 2)) / (c * h * w)


class DictHooks:
    """Name-keyed forward hooks; overwritten per forward like the
    reference's total_*_features dicts (SAGAN.py:669-680)."""

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


class SAGANOracle:
    """Reference-layout torch nets + the full cooperative iteration."""

    def __init__(self, ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8, z_dim=8,
                 lambda_content=1.0, lambda_gram=1.0, lambda_l1=0.0,
                 lr=1e-3, arch_lr=1e-4, threshold=0.5):
        from test_torch_parity import (TorchMaskOp, TorchSelfAttn,
                                       TorchSpecNorm, build_torch_sagan_d,
                                       build_torch_sagan_g)
        self._mask_cls = TorchMaskOp
        self.lam = dict(content=lambda_content, gram=lambda_gram,
                        l1=lambda_l1)
        self.sG = build_torch_sagan_g(ngf, z_dim)
        self.sD = build_torch_sagan_d(ndf, masked=True)
        self.tG = build_torch_sagan_g(teacher_ngf, z_dim)
        self.tD = build_torch_sagan_d(teacher_ndf, masked=False)

        # extract hooks at 'l2' / 'attn2' of each net (SAGAN.py:294-298);
        # dict order = registration order = [l2, attn2]
        def pick(net):
            return [(n, m) for n, m in net.named_modules()
                    if n in ("l2", "attn2")]

        self.h_sG, self.h_tG = DictHooks(pick(self.sG)), DictHooks(pick(self.tG))
        self.h_tD = DictHooks(pick(self.tD))

        # 1x1 student->teacher transforms, inserted when the scan hits the
        # extract layers (SAGAN.py:313-322); teacher widths [tngf*4, tngf]
        t_w = [teacher_ngf * 4, teacher_ngf]
        s_w = [ngf * 4, ngf]
        self.transforms = nn.ModuleList(
            [nn.Conv2d(s, t, 1, bias=False) for s, t in zip(s_w, t_w)])

        # ---- student G optimizer: the reference duplicate scan ----
        match = (nn.Conv2d, nn.BatchNorm2d, TorchSpecNorm, TorchSelfAttn,
                 nn.ConvTranspose2d)
        netG_parms = []
        index = 0
        for name, module in self.sG.named_modules():
            if name in ("l2", "attn2"):
                netG_parms += list(self.transforms[index].parameters())
                index += 1
            if isinstance(module, match):
                netG_parms += list(module.parameters())
        ad = dict(betas=(0.0, 0.9))
        self.opt_g = torch.optim.Adam(netG_parms, lr, **ad)

        # ---- student D optimizers: duplicate weight scan + alpha scan ----
        weight_params, arch_params = [], []
        for _name, module in self.sD.named_modules():
            if isinstance(module, match):
                weight_params += list(module.parameters())
            if isinstance(module, TorchMaskOp):
                arch_params += list(module.parameters())
        self.opt_d = torch.optim.Adam(weight_params, lr * 4, **ad)
        self.opt_arch = torch.optim.Adam(arch_params, arch_lr)
        self.alphas = arch_params

        # ---- teacher: plain .parameters() (darts/distill off in
        # teacher_opt, train.py:93-98) ----
        self.opt_tg = torch.optim.Adam(self.tG.parameters(), lr, **ad)
        self.opt_td = torch.optim.Adam(self.tD.parameters(), lr * 4, **ad)
        self.ema = None

    @staticmethod
    def _grad(mods, flag):
        for m in mods:
            for p in m.parameters():
                if p.dtype.is_floating_point:
                    p.requires_grad_(flag and not getattr(
                        p, "_never_grad", False))

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

        load(self.sG, te.export_sagan_generator(
            nets["g"]["params"], nets["g"].get("batch_stats", {}),
            nets["g"]["spectral"]))
        load(self.tG, te.export_sagan_generator(
            nets["tg"]["params"], nets["tg"].get("batch_stats", {}),
            nets["tg"]["spectral"]))
        load(self.sD, te.export_sagan_discriminator(
            nets["d"]["params"], nets["d"]["spectral"],
            nets["d"].get("arch")))
        load(self.tD, te.export_sagan_discriminator(
            nets["td"]["params"], nets["td"]["spectral"]))
        with torch.no_grad():
            for i, conv in enumerate(self.transforms):
                conv.weight.copy_(torch.tensor(np.asarray(
                    nets["tf"]["params"][f"tf_{i}"]["kernel"])
                ).permute(3, 2, 0, 1))
        # u/v must stay out of Adam's update path (reference
        # requires_grad=False Parameters, SAGAN.py:53-54)
        for net in (self.sG, self.sD, self.tG, self.tD):
            for n, p in net.named_parameters():
                if n.endswith("weight_u") or n.endswith("weight_v"):
                    p.requires_grad_(False)
                    p._never_grad = True

    def iteration(self, z, real, z_val, real_val, ema_beta=0.9):
        lam = self.lam
        m = {}

        # ---- teacher optimize: D then G (SAGAN.py:507-525) ----
        tfake = self.tG(z)
        t_gfeats = self.h_tG.values()
        self.opt_td.zero_grad()
        pr = self.tD(real)
        pf = self.tD(tfake.detach())
        (hinge_d_fake(pf) + hinge_d_real(pr)).backward()
        self.opt_td.step()
        self._grad([self.tD], False)
        self.opt_tg.zero_grad()
        pf2 = self.tD(tfake)  # post-update D; hooks -> distill D-targets
        hinge_g(pf2).backward()
        self.opt_tg.step()
        targets = [f.detach() for f in t_gfeats + self.h_tD.values()]
        tfake_d = tfake.detach()

        # ---- student forward + D update (D first, SAGAN.py:514-520) ----
        fake = self.sG(z)
        s_gfeats = self.h_sG.values()
        for a in self.alphas:
            a.requires_grad_(False)
        self.opt_d.zero_grad()
        pr = self.sD(real)
        pf = self.sD(fake.detach())
        m["D_real"], m["D_fake"] = hinge_d_real(pr), hinge_d_fake(pf)
        (m["D_fake"] + m["D_real"]).backward()
        self.opt_d.step()
        for a in self.alphas:
            a.requires_grad_(True)

        # ---- student G update (SAGAN.py:460-494) ----
        self._grad([self.sD], False)
        self.opt_g.zero_grad()
        pf = self.sD(fake)
        m["G_GAN"] = hinge_g(pf)
        self.tD(fake)  # teacher-D feats of the student fake, NOT detached
        tdf = self.h_tD.values()
        cur = [tr(f) for tr, f in zip(self.transforms, s_gfeats)] + tdf
        content = gram_l = 0.0
        for f, t in zip(cur, targets):
            content = content + torch.sqrt(F.mse_loss(f, t))
            gram_l = gram_l + torch.sqrt(F.mse_loss(gram(f), gram(t)))
        m["content"] = lam["content"] * content
        m["gram"] = lam["gram"] * gram_l
        m["L1"] = lam["l1"] * F.l1_loss(fake, tfake_d)
        (m["G_GAN"] + m["content"] + m["gram"] + m["L1"]).backward()
        self.opt_g.step()
        self._grad([self.sD], True)

        # ---- arch step on the val batch (SAGAN.py:388-418, 527-535) ----
        with torch.no_grad():
            for a in self.alphas:
                a.clamp_(0.0, 1.0)
        fake_v = self.sG(z_val)
        tfake_v = self.tG(z_val)
        # teacher get_D_arch_diff(isTeacher=True): grads off FIRST, so the
        # EMA tensor carries no graph
        self._grad([self.tD], False)
        pf = self.tD(tfake_v.detach())
        t_disc = torch.abs(hinge_g(pf) - hinge_d_fake(pf))
        self.tD(real_val)  # loss_D_arch_real computed but unused (teacher)
        self.ema = t_disc if self.ema is None \
            else ema_beta * t_disc + (1 - ema_beta) * self.ema
        self._grad([self.tD], True)
        # student arch backward: alphas only
        self._set_weight_grad(False)
        self.opt_arch.zero_grad()
        pf = self.sD(fake_v.detach())
        l_fake = hinge_d_fake(pf)
        s_disc = torch.abs(hinge_g(pf) - l_fake)
        pr = self.sD(real_val)
        l_real = hinge_d_real(pr)
        loss_arch = torch.abs(s_disc - self.ema) + l_real + l_fake
        loss_arch.backward()
        self.opt_arch.step()
        self._set_weight_grad(True)

        out = {k: float(v.detach()) for k, v in m.items()}
        out.update({"D_arch": float(loss_arch.detach()),
                    "D_arch_diff": float(s_disc.detach()),
                    "teacher_D_arch_diff": float(self.ema)})
        return out
