"""CycleGAN engine: dual mobile-resnet generators + dual PatchGANs with
cycle/identity losses, replay pools and online distillation
(models/CycleGAN.py:223-898).

Semantics preserved:
  * G-then-D update order (CycleGAN.py:567-588); both G's and both D's share
    one Adam each over the joint param trees (itertools.chain equivalent)
  * lsgan; D losses halved; cycle lambda_A = lambda_B = 10, identity 0.5
  * replay pools ImagePool(50) per direction feed the D updates; here the
    pool lives on-device inside the train state (engines.common.pool_query)
    so the step remains a single compiled program; the teacher keeps its own
    pools (CycleGAN.py:342-343)
  * distillation uses plain MSE (no sqrt, CycleGAN.py:513-514); the teacher-D
    features of the student fake are DETACHED in the reference
    (CycleGAN.py:492-493), so those terms carry no gradient — reproduced
    with stop_gradient
  * the reference accumulates the L1-to-teacher term once per feature pair
    (6x, CycleGAN.py:515,523) — reproduced
  * heavy-sparsity weighting during pretraining: 1000x on the first upsample
    deconv, 2x on stem/down/up convs (CycleGAN.py:539-559)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gcc_tpu.config import Config
from gcc_tpu.engines.common import (
    CombinedStepMixin, GANState, adam_step, add_sign_sparsity, apply_net,
    cyclegan_heavy_sparsity, d_pair, discrepancy, distill_losses, ema_update,
    make_adam, pool_init, pool_query,
)
from gcc_tpu.engines.pix2pix import TransformConvs
from gcc_tpu.losses import gan_loss, l1
from gcc_tpu.models.generators import MobileResnetGenerator
from gcc_tpu.models.discriminators import PatchGAN
from gcc_tpu.ops.mask import clip_alphas


class CycleGANEngine(CombinedStepMixin):
    loss_names = ["D_A", "G_A", "cycle_A", "idt_A",
                  "D_B", "G_B", "cycle_B", "idt_B"]
    visual_names = ["real_A", "fake_B", "rec_A", "idt_B",
                    "real_B", "fake_A", "rec_B", "idt_A"]

    def __init__(self, cfg: Config, cfg_AtoB=None, cfg_BtoA=None):
        self.cfg = cfg
        self.cfg_AtoB = cfg_AtoB
        self.cfg_BtoA = cfg_BtoA
        self.distill = cfg.online_distillation or cfg.normal_distillation
        self.darts = cfg.darts_discriminator
        self.gan_mode = cfg.gan_mode
        self.fused_d = cfg.fused_d_batch

        fb = {"auto": None, "on": True, "off": False}[cfg.fused_resblock]
        self.G_A = MobileResnetGenerator(ngf=cfg.ngf, cfg=cfg_AtoB,
                                         use_fused_blocks=fb)
        self.G_B = MobileResnetGenerator(ngf=cfg.ngf, cfg=cfg_BtoA,
                                         use_fused_blocks=fb)
        self.D_A = PatchGAN(ndf=cfg.ndf, norm="instance", masked=self.darts,
                            threshold=cfg.threshold)
        self.D_B = PatchGAN(ndf=cfg.ndf, norm="instance", masked=self.darts,
                            threshold=cfg.threshold)
        if self.distill:
            self.TG_A = MobileResnetGenerator(ngf=cfg.teacher_ngf,
                                              use_fused_blocks=fb)
            self.TG_B = MobileResnetGenerator(ngf=cfg.teacher_ngf,
                                              use_fused_blocks=fb)
            self.TD_A = PatchGAN(ndf=cfg.teacher_ndf, norm="instance")
            self.TD_B = PatchGAN(ndf=cfg.teacher_ndf, norm="instance")
            t_widths = (cfg.teacher_ngf * 4,) * 4
            self.TF_A = TransformConvs(t_widths)
            self.TF_B = TransformConvs(t_widths)

        self.tx_g = make_adam(0.5, 0.999)
        self.tx_d = make_adam(0.5, 0.999)
        self.tx_arch = make_adam(0.9, 0.999)
        self._jit_train = jax.jit(self._train_step, donate_argnums=0)
        self._jit_arch = jax.jit(self._arch_step, donate_argnums=0)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, image_size: Optional[int] = None
                   ) -> GANState:
        size = image_size or self.cfg.crop_size
        img = jnp.zeros((1, size, size, 3), jnp.float32)
        keys = jax.random.split(rng, 12)
        nets: Dict[str, Any] = {}
        opts: Dict[str, Any] = {}
        nets["g_a"] = dict(self.G_A.init({"params": keys[0]}, img, train=True))
        nets["g_b"] = dict(self.G_B.init({"params": keys[1]}, img, train=True))
        nets["d_a"] = dict(self.D_A.init({"params": keys[2]}, img, train=True))
        nets["d_b"] = dict(self.D_B.init({"params": keys[3]}, img, train=True))
        # one pool size for student AND teacher pools; the cyclegan preset
        # defaults it to the reference's hard-coded ImagePool(50)
        # (models/CycleGAN.py:342-343). An explicit 0 disables the pool
        # (ImagePool(0).query is a pass-through, utils/image_pool.py:24-26) —
        # used by the deterministic parity oracle.
        pool_shape = (size, size, 3)
        pool_n = self.cfg.pool_size
        nets["pool_a"] = pool_init(pool_n, pool_shape)
        nets["pool_b"] = pool_init(pool_n, pool_shape)
        if self.distill:
            nets["tg_a"] = dict(self.TG_A.init({"params": keys[4]}, img,
                                               train=True))
            nets["tg_b"] = dict(self.TG_B.init({"params": keys[5]}, img,
                                               train=True))
            nets["td_a"] = dict(self.TD_A.init({"params": keys[6]}, img,
                                               train=True))
            nets["td_b"] = dict(self.TD_B.init({"params": keys[7]}, img,
                                               train=True))
            nets["tpool_a"] = pool_init(pool_n, pool_shape)
            nets["tpool_b"] = pool_init(pool_n, pool_shape)
            _, _, fa = apply_net(self.G_A, nets["g_a"], img, train=False,
                                 capture=True, update_stats=False)
            _, _, fb = apply_net(self.G_B, nets["g_b"], img, train=False,
                                 capture=True, update_stats=False)
            nets["tf_a"] = dict(self.TF_A.init(keys[8], fa))
            nets["tf_b"] = dict(self.TF_B.init(keys[9], fb))
            if self.cfg.online_distillation:
                opts["tg"] = self.tx_g.init(
                    {"g_a": nets["tg_a"]["params"],
                     "g_b": nets["tg_b"]["params"]})
                opts["td"] = self.tx_d.init(
                    {"d_a": nets["td_a"]["params"],
                     "d_b": nets["td_b"]["params"]})
            g_bundle = {"g_a": nets["g_a"]["params"],
                        "g_b": nets["g_b"]["params"],
                        "tf_a": nets["tf_a"]["params"],
                        "tf_b": nets["tf_b"]["params"]}
        else:
            g_bundle = {"g_a": nets["g_a"]["params"],
                        "g_b": nets["g_b"]["params"]}
        opts["g"] = self.tx_g.init(g_bundle)
        opts["d"] = self.tx_d.init({"d_a": nets["d_a"]["params"],
                                    "d_b": nets["d_b"]["params"]})
        if self.darts:
            opts["arch"] = self.tx_arch.init({"d_a": nets["d_a"]["arch"],
                                              "d_b": nets["d_b"]["arch"]})
        ema = {"d_a_arch": jnp.float32(0.0), "d_b_arch": jnp.float32(0.0)}
        return GANState(step=jnp.int32(0), nets=nets, opts=opts, ema=ema,
                        rng=keys[11])

    # --------------------------------------------------------------- helpers

    def _g_forward_all(self, nets, ga_params, gb_params, A, B, capture,
                       teacher=False):
        """fake_B, rec_A, fake_A, rec_B, idt_A, idt_B (+ sown feats)."""
        GA, GB = (self.TG_A, self.TG_B) if teacher else (self.G_A, self.G_B)
        va = {**nets["g_a"], "params": ga_params}
        vb = {**nets["g_b"], "params": gb_params}
        fake_B, _, feats_A = apply_net(GA, va, A, capture=capture,
                                       update_stats=False)
        rec_A, _, _ = apply_net(GB, vb, fake_B, update_stats=False)
        fake_A, _, feats_B = apply_net(GB, vb, B, capture=capture,
                                       update_stats=False)
        rec_B, _, _ = apply_net(GA, va, fake_A, update_stats=False)
        idt_A, _, _ = apply_net(GA, va, B, update_stats=False)
        idt_B, _, _ = apply_net(GB, vb, A, update_stats=False)
        return fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, feats_A, feats_B

    # ------------------------------------------------------------- train step

    def train_step(self, state, batch, lr):
        return self._jit_train(state, batch, jnp.float32(lr))

    def _train_step(self, state, batch, lr):
        cfg = self.cfg
        A, B = batch["A"], batch["B"]
        lam_idt, lam_A, lam_B = cfg.lambda_identity, cfg.lambda_A, cfg.lambda_B
        nets = dict(state.nets)
        opts = dict(state.opts)
        m: Dict[str, jax.Array] = {}
        rng, k_pool_a, k_pool_b, k_tp_a, k_tp_b = jax.random.split(state.rng, 5)

        targets_A = targets_B = None
        t_fake_A = t_fake_B = None
        if self.distill and not cfg.online_distillation:
            # normal_distillation: frozen teachers, forward-only targets
            (t_fake_B, _, t_fake_A, _, _, _, tgfA, tgfB) = \
                self._g_forward_all(
                    {"g_a": nets["tg_a"], "g_b": nets["tg_b"]},
                    nets["tg_a"]["params"], nets["tg_b"]["params"],
                    A, B, capture=True, teacher=True)
            _, _, tdfA = apply_net(self.TD_A, nets["td_a"], t_fake_B,
                                   train=False, capture=True,
                                   update_stats=False)
            _, _, tdfB = apply_net(self.TD_B, nets["td_b"], t_fake_A,
                                   train=False, capture=True,
                                   update_stats=False)
            targets_A = [jax.lax.stop_gradient(f) for f in tgfA + tdfA]
            targets_B = [jax.lax.stop_gradient(f) for f in tgfB + tdfB]
            t_fake_B = jax.lax.stop_gradient(t_fake_B)
            t_fake_A = jax.lax.stop_gradient(t_fake_A)
        if self.distill and cfg.online_distillation:
            # ---- teacher G update (joint over both directions) ----
            def tg_loss(bundle):
                (tfB, trA, tfA, trB, tiA, tiB, fA, fB) = self._g_forward_all(
                    {"g_a": nets["tg_a"], "g_b": nets["tg_b"]},
                    bundle["g_a"], bundle["g_b"], A, B, capture=True,
                    teacher=True)
                pfa, _, _ = apply_net(self.TD_A, nets["td_a"], tfB,
                                      update_stats=False)
                pfb, _, _ = apply_net(self.TD_B, nets["td_b"], tfA,
                                      update_stats=False)
                loss = (gan_loss(pfa, True, self.gan_mode)
                        + gan_loss(pfb, True, self.gan_mode)
                        + lam_A * l1(trA, A) + lam_B * l1(trB, B)
                        + lam_idt * (lam_B * l1(tiA, B) + lam_A * l1(tiB, A)))
                return loss, (fA, fB, tfB, tfA)

            tg_bundle = {"g_a": nets["tg_a"]["params"],
                         "g_b": nets["tg_b"]["params"]}
            (_, (tgfA, tgfB, t_fake_B, t_fake_A)), gtg = jax.value_and_grad(
                tg_loss, has_aux=True)(tg_bundle)
            # the TEACHER gets the sparsity injection too: teacher_opt is a
            # deepcopy keeping lambda_weight/lambda_scale (train.py:93-98) and
            # the teacher's backward_G ends in L1_sparsity (CycleGAN.py:537),
            # heavy weighting included
            for k in ("g_a", "g_b"):
                gtg[k] = add_sign_sparsity(
                    gtg[k], tg_bundle[k], cfg.lambda_weight, cfg.lambda_scale,
                    weight_scale_fn=cyclegan_heavy_sparsity)
            new_tg, opts["tg"] = adam_step(self.tx_g, gtg, opts["tg"],
                                           tg_bundle, jnp.float32(cfg.lr))
            nets["tg_a"] = {**nets["tg_a"], "params": new_tg["g_a"]}
            nets["tg_b"] = {**nets["tg_b"], "params": new_tg["g_b"]}
            t_fake_B = jax.lax.stop_gradient(t_fake_B)
            t_fake_A = jax.lax.stop_gradient(t_fake_A)

            # ---- teacher D update with its own pools; capture target D feats
            # from the last TD forward (backward_D_basic fake pass) ----
            nets["tpool_b"], tp_fake_B = pool_query(nets["tpool_b"],
                                                    t_fake_B, k_tp_b)
            nets["tpool_a"], tp_fake_A = pool_query(nets["tpool_a"],
                                                    t_fake_A, k_tp_a)

            def td_loss(bundle):
                va = {**nets["td_a"], "params": bundle["d_a"]}
                vb = {**nets["td_b"], "params": bundle["d_b"]}
                pra, pfa, _, tdfA = d_pair(self.TD_A, va, B, tp_fake_B,
                                           fused=self.fused_d,
                                           update_stats=False,
                                           capture_b=True)
                prb, pfb, _, tdfB = d_pair(self.TD_B, vb, A, tp_fake_A,
                                           fused=self.fused_d,
                                           update_stats=False,
                                           capture_b=True)
                loss = ((gan_loss(pra, True, self.gan_mode)
                         + gan_loss(pfa, False, self.gan_mode)) * 0.5
                        + (gan_loss(prb, True, self.gan_mode)
                           + gan_loss(pfb, False, self.gan_mode)) * 0.5)
                return loss, (tdfA, tdfB)

            td_bundle = {"d_a": nets["td_a"]["params"],
                         "d_b": nets["td_b"]["params"]}
            (_, (tdfA, tdfB)), gtd = jax.value_and_grad(
                td_loss, has_aux=True)(td_bundle)
            new_td, opts["td"] = adam_step(self.tx_d, gtd, opts["td"],
                                           td_bundle, jnp.float32(cfg.lr))
            nets["td_a"] = {**nets["td_a"], "params": new_td["d_a"]}
            nets["td_b"] = {**nets["td_b"], "params": new_td["d_b"]}
            targets_A = [jax.lax.stop_gradient(f) for f in tgfA + tdfA]
            targets_B = [jax.lax.stop_gradient(f) for f in tgfB + tdfB]

        # ---- student G update (G-then-D, CycleGAN.py:567-588) ----
        def g_loss(bundle):
            (fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, fA, fB) = \
                self._g_forward_all(nets, bundle["g_a"], bundle["g_b"],
                                    A, B, capture=True)
            # student D BN stats DO update on this forward (torch train-mode
            # semantics, like the pix2pix engine's g_loss): the masked D is
            # BatchNorm, and the reference never flips it to eval
            pfa, da_v, _ = apply_net(self.D_A, nets["d_a"], fake_B)
            pfb, db_v, _ = apply_net(self.D_B, nets["d_b"], fake_A)
            aux_m = {
                "G_A": gan_loss(pfa, True, self.gan_mode),
                "G_B": gan_loss(pfb, True, self.gan_mode),
                "cycle_A": lam_A * l1(rec_A, A),
                "cycle_B": lam_B * l1(rec_B, B),
                "idt_A": lam_idt * lam_B * l1(idt_A, B),
                "idt_B": lam_idt * lam_A * l1(idt_B, A),
            }
            loss = sum(aux_m.values())
            if self.distill:
                trA = self.TF_A.apply({"params": bundle["tf_a"]}, fA)
                trB = self.TF_B.apply({"params": bundle["tf_b"]}, fB)
                # teacher-D feats of the student fake are detached in the
                # reference (CycleGAN.py:492-493): no grad flows through them
                _, _, sdA = apply_net(self.TD_A, nets["td_a"],
                                      jax.lax.stop_gradient(fake_B),
                                      capture=True, update_stats=False)
                _, _, sdB = apply_net(self.TD_B, nets["td_b"],
                                      jax.lax.stop_gradient(fake_A),
                                      capture=True, update_stats=False)
                cA, gA = distill_losses(trA + sdA, targets_A, use_sqrt=False)
                cB, gB = distill_losses(trB + sdB, targets_B, use_sqrt=False)
                n_feats = len(trA) + len(sdA)
                aux_m["content_A"] = cfg.lambda_content * cA
                aux_m["content_B"] = cfg.lambda_content * cB
                aux_m["gram_A"] = cfg.lambda_gram * gA
                aux_m["gram_B"] = cfg.lambda_gram * gB
                # L1 accumulated once per feature pair (CycleGAN.py:515,523)
                aux_m["L1_A"] = cfg.lambda_L1 * n_feats * l1(fake_B, t_fake_B)
                aux_m["L1_B"] = cfg.lambda_L1 * n_feats * l1(fake_A, t_fake_A)
                loss = loss + aux_m["content_A"] + aux_m["content_B"] \
                    + aux_m["gram_A"] + aux_m["gram_B"] \
                    + aux_m["L1_A"] + aux_m["L1_B"]
            return loss, (fake_B, fake_A, da_v, db_v, aux_m)

        g_bundle = {"g_a": nets["g_a"]["params"], "g_b": nets["g_b"]["params"]}
        if self.distill:
            g_bundle["tf_a"] = nets["tf_a"]["params"]
            g_bundle["tf_b"] = nets["tf_b"]["params"]
        (_, (fake_B, fake_A, da_v, db_v, aux_m)), gg = jax.value_and_grad(
            g_loss, has_aux=True)(g_bundle)
        nets["d_a"] = {**da_v, "params": nets["d_a"]["params"]}
        nets["d_b"] = {**db_v, "params": nets["d_b"]["params"]}
        for k in ("g_a", "g_b"):
            gg[k] = add_sign_sparsity(gg[k], g_bundle[k], cfg.lambda_weight,
                                      cfg.lambda_scale,
                                      weight_scale_fn=cyclegan_heavy_sparsity)
        new_g, opts["g"] = adam_step(self.tx_g, gg, opts["g"], g_bundle, lr)
        nets["g_a"] = {**nets["g_a"], "params": new_g["g_a"]}
        nets["g_b"] = {**nets["g_b"], "params": new_g["g_b"]}
        if self.distill:
            nets["tf_a"] = {"params": new_g["tf_a"]}
            nets["tf_b"] = {"params": new_g["tf_b"]}
        m.update(aux_m)
        fake_B = jax.lax.stop_gradient(fake_B)
        fake_A = jax.lax.stop_gradient(fake_A)

        # ---- student D update with replay pools ----
        nets["pool_b"], pooled_fake_B = pool_query(nets["pool_b"], fake_B,
                                                   k_pool_b)
        nets["pool_a"], pooled_fake_A = pool_query(nets["pool_a"], fake_A,
                                                   k_pool_a)

        def d_loss(bundle):
            va = {**nets["d_a"], "params": bundle["d_a"]}
            vb = {**nets["d_b"], "params": bundle["d_b"]}
            pra, pfa, va = d_pair(self.D_A, va, B, pooled_fake_B,
                                  fused=self.fused_d)
            prb, pfb, vb = d_pair(self.D_B, vb, A, pooled_fake_A,
                                  fused=self.fused_d)
            lda = (gan_loss(pra, True, self.gan_mode)
                   + gan_loss(pfa, False, self.gan_mode)) * 0.5
            ldb = (gan_loss(prb, True, self.gan_mode)
                   + gan_loss(pfb, False, self.gan_mode)) * 0.5
            return lda + ldb, (va, vb, lda, ldb)

        d_bundle = {"d_a": nets["d_a"]["params"], "d_b": nets["d_b"]["params"]}
        (_, (da_vars, db_vars, lda, ldb)), gd = jax.value_and_grad(
            d_loss, has_aux=True)(d_bundle)
        new_d, opts["d"] = adam_step(self.tx_d, gd, opts["d"], d_bundle, lr)
        nets["d_a"] = {**da_vars, "params": new_d["d_a"]}
        nets["d_b"] = {**db_vars, "params": new_d["d_b"]}
        m["D_A"], m["D_B"] = lda, ldb

        new_state = GANState(step=state.step + 1, nets=nets, opts=opts,
                             ema=state.ema, rng=rng)
        return new_state, {k: jnp.asarray(v, jnp.float32)
                           for k, v in m.items()}

    # -------------------------------------------------------------- arch step

    def arch_step(self, state, batch, ema_beta, arch_lr: float = None):
        if arch_lr is None:
            arch_lr = self.cfg.arch_lr
        return self._jit_arch(state, batch, jnp.float32(ema_beta),
                              jnp.float32(arch_lr))

    def _arch_step(self, state, batch, ema_beta, arch_lr):
        cfg = self.cfg
        A, B = batch["A"], batch["B"]
        nets = dict(state.nets)
        opts = dict(state.opts)
        ema = dict(state.ema)
        rng = jax.random.fold_in(state.rng, state.step + 23)

        fake_B, _, _ = apply_net(self.G_A, nets["g_a"], A, update_stats=False)
        fake_A, _, _ = apply_net(self.G_B, nets["g_b"], B, update_stats=False)
        t_fake_B, _, _ = apply_net(self.TG_A, nets["tg_a"], A,
                                   update_stats=False)
        t_fake_A, _, _ = apply_net(self.TG_B, nets["tg_b"], B,
                                   update_stats=False)
        fake_B, fake_A = map(jax.lax.stop_gradient, (fake_B, fake_A))
        t_fake_B, t_fake_A = map(jax.lax.stop_gradient, (t_fake_B, t_fake_A))

        tpa, _, _ = apply_net(self.TD_A, nets["td_a"], t_fake_B,
                              update_stats=False)
        tpb, _, _ = apply_net(self.TD_B, nets["td_b"], t_fake_A,
                              update_stats=False)
        ema["d_a_arch"] = ema_update(ema["d_a_arch"],
                                     discrepancy(tpa, self.gan_mode), ema_beta)
        ema["d_b_arch"] = ema_update(ema["d_b_arch"],
                                     discrepancy(tpb, self.gan_mode), ema_beta)
        tgt_a = jax.lax.stop_gradient(ema["d_a_arch"])
        tgt_b = jax.lax.stop_gradient(ema["d_b_arch"])

        alphas = {"d_a": clip_alphas(nets["d_a"]["arch"]),
                  "d_b": clip_alphas(nets["d_b"]["arch"])}

        def arch_loss(a):
            va = {**nets["d_a"], "arch": a["d_a"]}
            vb = {**nets["d_b"], "arch": a["d_b"]}
            pfa, va, _ = apply_net(self.D_A, va, fake_B)
            disc_a = discrepancy(pfa, self.gan_mode)
            pra, va, _ = apply_net(self.D_A, va, B)
            pfb, vb, _ = apply_net(self.D_B, vb, fake_A)
            disc_b = discrepancy(pfb, self.gan_mode)
            prb, vb, _ = apply_net(self.D_B, vb, A)
            loss_a = jnp.abs(disc_a - tgt_a) + (
                gan_loss(pfa, False, self.gan_mode)
                + gan_loss(pra, True, self.gan_mode)) * 0.5
            loss_b = jnp.abs(disc_b - tgt_b) + (
                gan_loss(pfb, False, self.gan_mode)
                + gan_loss(prb, True, self.gan_mode)) * 0.5
            return loss_a + loss_b, (va, vb, loss_a, loss_b, disc_a, disc_b)

        (_, (da_vars, db_vars, la, lb, disc_a, disc_b)), ga = \
            jax.value_and_grad(arch_loss, has_aux=True)(alphas)
        new_alphas, opts["arch"] = adam_step(self.tx_arch, ga, opts["arch"],
                                             alphas, arch_lr)
        nets["d_a"] = {**da_vars, "arch": new_alphas["d_a"]}
        nets["d_b"] = {**db_vars, "arch": new_alphas["d_b"]}

        new_state = GANState(step=state.step, nets=nets, opts=opts, ema=ema,
                             rng=rng)
        metrics = {"D_arch_A": la, "D_arch_B": lb,
                   "D_arch_diff_A": disc_a, "D_arch_diff_B": disc_b,
                   "teacher_netD_A_arch_diff": ema["d_a_arch"],
                   "teacher_netD_B_arch_diff": ema["d_b_arch"]}
        return new_state, metrics

    # ------------------------------------------------------------------ eval

    def generate(self, state: GANState, x: jax.Array,
                 direction: str = "AtoB", teacher: bool = False) -> jax.Array:
        return self._generate(state, x, direction, teacher)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _generate(self, state, x, direction="AtoB", teacher=False):
        if direction == "AtoB":
            net, mod = (state.nets["tg_a"], self.TG_A) if teacher \
                else (state.nets["g_a"], self.G_A)
        else:
            net, mod = (state.nets["tg_b"], self.TG_B) if teacher \
                else (state.nets["g_b"], self.G_B)
        out, _, _ = apply_net(mod, net, x, train=False, update_stats=False)
        return out

    def generate_spatial(self, state, x, n_spatial=None, mesh=None,
                         direction: str = "AtoB", teacher: bool = False):
        from gcc_tpu.parallel.spatial import spatial_apply
        if direction == "AtoB":
            mod, net = ((self.TG_A, "tg_a") if teacher else (self.G_A, "g_a"))
        else:
            mod, net = ((self.TG_B, "tg_b") if teacher else (self.G_B, "g_b"))
        mod = self._spatial_safe(mod, net)
        return spatial_apply(mod, state.nets[net], x, mesh=mesh,
                             n_spatial=n_spatial)

    # ------------------------------------------------------------- checkpoint

    def checkpoint_payload(self, state, epoch, metric=None) -> dict:
        return {"G_A": state.nets["g_a"], "G_B": state.nets["g_b"],
                "D_A": state.nets["d_a"], "D_B": state.nets["d_b"],
                "epoch": epoch, "cfg": (self.cfg_AtoB, self.cfg_BtoA),
                "fid": metric}

    def load_net_params(self, state, ckpt, load_discriminator=True):
        nets = dict(state.nets)
        nets["g_a"], nets["g_b"] = ckpt["G_A"], ckpt["G_B"]
        if load_discriminator and ckpt.get("D_A") is not None:
            nets["d_a"], nets["d_b"] = ckpt["D_A"], ckpt["D_B"]
        return state.replace(nets=nets)
