"""CycleGAN cooperative-iteration parity oracle: the reference algorithm in
torch (CPU), built FROM THE BEHAVIORAL SPEC — no reference imports.

One reference iteration (models/CycleGAN.py:342-640, train.py:144-151):
  teacher G joint update (G-then-D: GAN both directions + cycle + identity)
  -> teacher D joint update (pools; distillation D-targets captured from the
     pre-update D forward, CycleGAN.py hooks during backward_D_basic)
  -> student G joint update: GAN + cycle + identity + plain-MSE content/gram
     distillation (teacher-D features of the student fake DETACHED,
     CycleGAN.py:492-493) + per-feature-pair L1-to-teacher (l.515,523)
  -> student D joint update with pools
  -> DARTS arch step on a val batch: per-direction teacher-discrepancy EMA,
     |disc - ema| + D GAN terms, alpha-only Adam.

Pools are DISABLED (pool_size=0 == reference ImagePool(0) pass-through,
utils/image_pool.py:24-26) so both sides are deterministic — the pool's
50%% swap decisions cannot be made bit-identical across frameworks.

Weights load from a CycleGANEngine GANState via the strict-load export
mappings (gcc_tpu.utils.torch_export) into reference-layout torch modules
(the same from-spec builders the export-parity tests pin), with forward
hooks at the reference extract indices ('model.9/12/15/18' for G,
post-norm stages 1/3 for D). Used by tests/test_cooperative_parity_cyclegan.
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


def mse_gan(pred, real: bool):
    """lsgan: MSE against the 1/0 target (GANLoss.py, mode 'lsgan')."""
    t = torch.ones_like(pred) if real else torch.zeros_like(pred)
    return F.mse_loss(pred, t)


def lsgan_discrepancy(pred_fake):
    return (mse_gan(pred_fake, True) - mse_gan(pred_fake, False)).abs()


def gram(f):
    n, c, h, w = f.shape
    flat = f.reshape(n, c, h * w)
    return flat.bmm(flat.transpose(1, 2)) / (c * h * w)


class Hooks:
    """Forward hooks on chosen submodules; snapshot() returns + clears."""

    def __init__(self, modules):
        self.buf = []
        for m in modules:
            m.register_forward_hook(
                lambda _m, _i, out: self.buf.append(out))

    def snapshot(self):
        out, self.buf = list(self.buf), []
        return out


def build_instance_patchgan(ndf, in_ch=3):
    """Reference NLayerDiscriminator with InstanceNorm (CycleGAN.py:140-178):
    plain Sequential layout, convs keep their bias (no-affine norm)."""
    layers = [nn.Conv2d(in_ch, ndf, 4, 2, 1), nn.LeakyReLU(0.2)]
    nf = 1
    for i in range(1, 4):
        nf_prev, nf = nf, min(2 ** i, 8)
        stride = 2 if i < 3 else 1
        layers += [nn.Conv2d(ndf * nf_prev, ndf * nf, 4, stride, 1),
                   nn.InstanceNorm2d(ndf * nf), nn.LeakyReLU(0.2)]
    layers.append(nn.Conv2d(ndf * nf, 1, 4, 1, 1))

    class D(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = nn.Sequential(*layers)

        def forward(self, x):
            return self.model(x)

    return D()


class CycleGANOracle:
    """Reference-layout torch nets + the full cooperative iteration."""

    def __init__(self, ngf=4, ndf=8, teacher_ngf=8, teacher_ndf=8,
                 n_blocks=9, lambda_A=10.0, lambda_B=10.0,
                 lambda_idt=0.5, lambda_content=0.01, lambda_gram=10.0,
                 lambda_l1=1.0, lr=2e-4, arch_lr=1e-4):
        from test_torch_parity import (build_torch_masked_patchgan,
                                       build_torch_mobile_resnet)
        self.lam = dict(A=lambda_A, B=lambda_B, idt=lambda_idt,
                        content=lambda_content, gram=lambda_gram,
                        l1=lambda_l1)
        self.sGA = build_torch_mobile_resnet(ngf, n_blocks)
        self.sGB = build_torch_mobile_resnet(ngf, n_blocks)
        self.tGA = build_torch_mobile_resnet(teacher_ngf, n_blocks)
        self.tGB = build_torch_mobile_resnet(teacher_ngf, n_blocks)
        self.sDA = _Wrap(build_torch_masked_patchgan(ndf, in_ch=3))
        self.sDB = _Wrap(build_torch_masked_patchgan(ndf, in_ch=3))
        self.tDA = build_instance_patchgan(teacher_ndf)
        self.tDB = build_instance_patchgan(teacher_ndf)

        # extract hooks: G at model.9 + block outputs 2/5/8 (model.12/15/18,
        # CycleGAN.py:239); teacher D post-norm stages 1/3 (plain layout
        # indices 3/9); student masked D post-norm (masked layout 4/12)
        def g_hooks(g):
            return Hooks([g.model[9], g.model[12], g.model[15], g.model[18]])

        self.h_sGA, self.h_sGB = g_hooks(self.sGA), g_hooks(self.sGB)
        self.h_tGA, self.h_tGB = g_hooks(self.tGA), g_hooks(self.tGB)
        self.h_tDA = Hooks([self.tDA.model[3], self.tDA.model[9]])
        self.h_tDB = Hooks([self.tDB.model[3], self.tDB.model[9]])
        self.h_sDA = Hooks([self.sDA.model[4], self.sDA.model[12]])
        self.h_sDB = Hooks([self.sDB.model[4], self.sDB.model[12]])

        # 1x1 student->teacher transforms: teacher widths are tngf*4 for all
        # four cyclegan extract points (engines/cyclegan.py t_widths)
        with torch.no_grad():
            d = torch.zeros(1, 3, 32, 32)
            self.sGA(d)
            widths_a = [f.shape[1] for f in self.h_sGA.snapshot()]
            self.sGB(d)
            widths_b = [f.shape[1] for f in self.h_sGB.snapshot()]
        self.trA = nn.ModuleList([nn.Conv2d(w, teacher_ngf * 4, 1, bias=False)
                                  for w in widths_a])
        self.trB = nn.ModuleList([nn.Conv2d(w, teacher_ngf * 4, 1, bias=False)
                                  for w in widths_b])

        ad = dict(betas=(0.5, 0.999))
        self.opt_tg = torch.optim.Adam(
            list(self.tGA.parameters()) + list(self.tGB.parameters()),
            lr, **ad)
        self.opt_td = torch.optim.Adam(
            list(self.tDA.parameters()) + list(self.tDB.parameters()),
            lr, **ad)
        self.opt_g = torch.optim.Adam(
            list(self.sGA.parameters()) + list(self.sGB.parameters())
            + list(self.trA.parameters()) + list(self.trB.parameters()),
            lr, **ad)
        d_params = [p for n_, p in list(self.sDA.named_parameters())
                    + list(self.sDB.named_parameters()) if "alpha" not in n_]
        self.alphas = [p for n_, p in list(self.sDA.named_parameters())
                       + list(self.sDB.named_parameters()) if "alpha" in n_]
        self.opt_d = torch.optim.Adam(d_params, lr, **ad)
        self.opt_arch = torch.optim.Adam(self.alphas, arch_lr)
        self.ema_a = self.ema_b = None

    @staticmethod
    def _grad(mods, flag):
        for m in mods:
            for p in m.parameters():
                p.requires_grad_(flag)

    def load_from_jax_state(self, nets):
        """GANState.nets snapshot (numpy pytrees) -> these torch modules via
        the strict-load export mappings."""
        from gcc_tpu.utils import torch_export as te

        def load(mod, sd, strip=False):
            t = {k[len("model."):] if strip else k: torch.tensor(
                np.asarray(v)) for k, v in sd.items()}
            (mod.model if strip else mod).load_state_dict(t, strict=True)

        load(self.sGA, te.export_mobile_resnet(nets["g_a"]["params"]))
        load(self.sGB, te.export_mobile_resnet(nets["g_b"]["params"]))
        load(self.tGA, te.export_mobile_resnet(nets["tg_a"]["params"]))
        load(self.tGB, te.export_mobile_resnet(nets["tg_b"]["params"]))
        load(self.tDA, te.export_patchgan(nets["td_a"]["params"], {}))
        load(self.tDB, te.export_patchgan(nets["td_b"]["params"], {}))
        load(self.sDA, te.export_patchgan(
            nets["d_a"]["params"], nets["d_a"].get("batch_stats", {}),
            nets["d_a"].get("arch"), masked=True), strip=True)
        load(self.sDB, te.export_patchgan(
            nets["d_b"]["params"], nets["d_b"].get("batch_stats", {}),
            nets["d_b"].get("arch"), masked=True), strip=True)
        with torch.no_grad():
            for tr, node in ((self.trA, nets["tf_a"]),
                             (self.trB, nets["tf_b"])):
                for i, conv in enumerate(tr):
                    conv.weight.copy_(torch.tensor(np.asarray(
                        node["params"][f"tf_{i}"]["kernel"])
                    ).permute(3, 2, 0, 1))

    def iteration(self, A, B, Av, Bv, ema_beta=0.9):
        lam = self.lam
        m = {}

        # ---- teacher G joint update (G-then-D, CycleGAN.py:567-588) ----
        self._grad([self.tDA, self.tDB], False)
        self.opt_tg.zero_grad()
        tfB = self.tGA(A)
        tgfA = self.h_tGA.snapshot()  # features of tGA(A) only
        trecA = self.tGB(tfB)
        self.h_tGB.snapshot()  # drop the cycle fire
        tfA = self.tGB(B)
        tgfB = self.h_tGB.snapshot()  # features of tGB(B) only
        trecB = self.tGA(tfA)
        tidtA = self.tGA(B)
        tidtB = self.tGB(A)
        self.h_tGA.snapshot(), self.h_tGB.snapshot()  # drop non-extract fires
        loss_tg = (mse_gan(self.tDA(tfB), True)
                   + mse_gan(self.tDB(tfA), True)
                   + lam["A"] * F.l1_loss(trecA, A)
                   + lam["B"] * F.l1_loss(trecB, B)
                   + lam["idt"] * (lam["B"] * F.l1_loss(tidtA, B)
                                   + lam["A"] * F.l1_loss(tidtB, A)))
        loss_tg.backward()
        self.opt_tg.step()
        self._grad([self.tDA, self.tDB], True)
        tfB_d, tfA_d = tfB.detach(), tfA.detach()

        # ---- teacher D joint update; D-feature targets from the pre-update
        # forward (reference hooks fire in backward_D_basic) ----
        self.opt_td.zero_grad()
        pra = self.tDA(B)
        self.h_tDA.snapshot()
        pfa = self.tDA(tfB_d)
        tdfA = self.h_tDA.snapshot()
        prb = self.tDB(A)
        self.h_tDB.snapshot()
        pfb = self.tDB(tfA_d)
        tdfB = self.h_tDB.snapshot()
        loss_td = ((mse_gan(pra, True) + mse_gan(pfa, False)) * 0.5
                   + (mse_gan(prb, True) + mse_gan(pfb, False)) * 0.5)
        loss_td.backward()
        self.opt_td.step()
        targets_A = [t.detach() for t in tgfA + tdfA]
        targets_B = [t.detach() for t in tgfB + tdfB]

        # ---- student G joint update ----
        self._grad([self.sDA, self.sDB, self.tDA, self.tDB], False)
        self.opt_g.zero_grad()
        fB = self.sGA(A)
        sfA = self.h_sGA.snapshot()  # features of sGA(A) only
        recA = self.sGB(fB)
        self.h_sGB.snapshot()  # drop the cycle fire
        fA = self.sGB(B)
        sfB = self.h_sGB.snapshot()  # features of sGB(B) only
        recB = self.sGA(fA)
        idtA = self.sGA(B)
        idtB = self.sGB(A)
        self.h_sGA.snapshot(), self.h_sGB.snapshot()
        m["G_A"] = mse_gan(self.sDA(fB), True)
        self.h_sDA.snapshot()
        m["G_B"] = mse_gan(self.sDB(fA), True)
        self.h_sDB.snapshot()
        m["cycle_A"] = lam["A"] * F.l1_loss(recA, A)
        m["cycle_B"] = lam["B"] * F.l1_loss(recB, B)
        m["idt_A"] = lam["idt"] * lam["B"] * F.l1_loss(idtA, B)
        m["idt_B"] = lam["idt"] * lam["A"] * F.l1_loss(idtB, A)
        with torch.no_grad():  # detached in the reference (CycleGAN.py:492)
            self.tDA(fB.detach())
            sdA = self.h_tDA.snapshot()
            self.tDB(fA.detach())
            sdB = self.h_tDB.snapshot()
        trA_f = [tr(f) for tr, f in zip(self.trA, sfA)]
        trB_f = [tr(f) for tr, f in zip(self.trB, sfB)]

        def dist(feats, targets):
            c = g = 0.0
            for f, t in zip(feats, targets):
                c = c + F.mse_loss(f, t)
                g = g + F.mse_loss(gram(f), gram(t))
            return c, g

        cA, gA = dist(trA_f + sdA, targets_A)
        cB, gB = dist(trB_f + sdB, targets_B)
        n_feats = len(trA_f) + len(sdA)
        m["content_A"] = lam["content"] * cA
        m["content_B"] = lam["content"] * cB
        m["gram_A"] = lam["gram"] * gA
        m["gram_B"] = lam["gram"] * gB
        m["L1_A"] = lam["l1"] * n_feats * F.l1_loss(fB, tfB_d)
        m["L1_B"] = lam["l1"] * n_feats * F.l1_loss(fA, tfA_d)
        loss_g = sum(m.values())
        loss_g.backward()
        self.opt_g.step()
        self._grad([self.sDA, self.sDB, self.tDA, self.tDB], True)
        fB_d, fA_d = fB.detach(), fA.detach()

        # ---- student D joint update (pool pass-through) ----
        for a in self.alphas:
            a.requires_grad_(False)
        self.opt_d.zero_grad()
        pra = self.sDA(B)
        pfa = self.sDA(fB_d)
        prb = self.sDB(A)
        pfb = self.sDB(fA_d)
        self.h_sDA.snapshot(), self.h_sDB.snapshot()
        m["D_A"] = (mse_gan(pra, True) + mse_gan(pfa, False)) * 0.5
        m["D_B"] = (mse_gan(prb, True) + mse_gan(pfb, False)) * 0.5
        (m["D_A"] + m["D_B"]).backward()
        self.opt_d.step()
        for a in self.alphas:
            a.requires_grad_(True)

        # ---- arch step on the val batch (train.py:147-151) ----
        with torch.no_grad():
            for a in self.alphas:
                a.clamp_(0.0, 1.0)
            vfB = self.sGA(Av)
            vfA = self.sGB(Bv)
            tvfB = self.tGA(Av)
            tvfA = self.tGB(Bv)
            self.h_sGA.snapshot(), self.h_sGB.snapshot()
            self.h_tGA.snapshot(), self.h_tGB.snapshot()
            disc_ta = lsgan_discrepancy(self.tDA(tvfB))
            disc_tb = lsgan_discrepancy(self.tDB(tvfA))
            self.h_tDA.snapshot(), self.h_tDB.snapshot()
            self.ema_a = disc_ta if self.ema_a is None \
                else ema_beta * disc_ta + (1 - ema_beta) * self.ema_a
            self.ema_b = disc_tb if self.ema_b is None \
                else ema_beta * disc_tb + (1 - ema_beta) * self.ema_b
        self._grad([self.sDA, self.sDB], False)
        for a in self.alphas:
            a.requires_grad_(True)
        self.opt_arch.zero_grad()
        pfa = self.sDA(vfB)
        disc_a = lsgan_discrepancy(pfa)
        pra = self.sDA(Bv)
        pfb = self.sDB(vfA)
        disc_b = lsgan_discrepancy(pfb)
        prb = self.sDB(Av)
        self.h_sDA.snapshot(), self.h_sDB.snapshot()
        la = (disc_a - self.ema_a).abs() \
            + (mse_gan(pfa, False) + mse_gan(pra, True)) * 0.5
        lb = (disc_b - self.ema_b).abs() \
            + (mse_gan(pfb, False) + mse_gan(prb, True)) * 0.5
        (la + lb).backward()
        self.opt_arch.step()
        self._grad([self.sDA, self.sDB], True)

        out = {k: float(v.detach()) for k, v in m.items()}
        out.update({"D_arch_A": float(la.detach()),
                    "D_arch_B": float(lb.detach()),
                    "D_arch_diff_A": float(disc_a.detach()),
                    "D_arch_diff_B": float(disc_b.detach()),
                    "teacher_netD_A_arch_diff": float(self.ema_a),
                    "teacher_netD_B_arch_diff": float(self.ema_b)})
        return out


class _Wrap(nn.Module):
    """Expose a bare Sequential under `.model` (reference module path)."""

    def __init__(self, seq):
        super().__init__()
        self.model = seq

    def forward(self, x):
        return self.model(x)
