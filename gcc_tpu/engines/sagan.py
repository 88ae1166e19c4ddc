"""SAGAN engine: hinge-loss self-attention GAN with TTUR and online
distillation (models/SAGAN.py:279-755).

Semantics preserved:
  * Adam betas (0, 0.9); D learning rate = 4x G learning rate
    (SAGAN.py:302, 346, 356)
  * D-then-G update order; D loss = lf + lr, unhalved (SAGAN.py:375-386)
  * backward_D runs D on real first, then fake (spectral u/v update order)
  * distill: 2 transformed G features + teacher-D features on the student
    fake, sqrt(MSE) content/gram, plus lambda_L1 * L1(fake, teacher fake)
    (SAGAN.py:460-492)
  * arch loss: |student disc - teacher EMA| + (l_real + l_fake), unhalved
    (SAGAN.py:388-395)
  * the reference's student optimizer scans (SAGAN.py:315-327, 339-346)
    add every SpectralNorm-wrapped conv and attention q/k/v conv TWICE
    (wrapper + inner module both match the isinstance filter), and torch
    applies one Adam update per occurrence — replicated via dup_adam_step
    for the student G (distill branch) and masked D. The teacher model is
    built with online_distillation=False / darts_discriminator=False
    (train.py:93-98), so its optimizers use plain .parameters() — single
    updates.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gcc_tpu.config import Config
from gcc_tpu.engines.common import (
    CombinedStepMixin, GANState, adam_step, add_sign_sparsity, apply_net,
    d_pair, discrepancy, distill_losses, dup_adam_step, dup_path_mask,
    ema_update, make_adam,
)
from gcc_tpu.engines.pix2pix import TransformConvs
from gcc_tpu.losses import gan_loss, l1
from gcc_tpu.models.generators import SAGANGenerator
from gcc_tpu.models.discriminators import SAGANDiscriminator
from gcc_tpu.ops.mask import clip_alphas


class SAGANEngine(CombinedStepMixin):
    loss_names = ["G_GAN", "D_real", "D_fake"]
    visual_names = ["fake_img", "real_img"]

    def __init__(self, cfg: Config, filter_cfgs=None, channel_cfgs=None):
        self.cfg = cfg
        self.filter_cfgs = filter_cfgs
        self.channel_cfgs = channel_cfgs
        self.distill = cfg.online_distillation or cfg.normal_distillation
        self.darts = cfg.darts_discriminator
        self.gan_mode = cfg.gan_mode
        self.fused_d = cfg.fused_d_batch

        thr = cfg.pallas_attn_threshold
        self.G = SAGANGenerator(ngf=cfg.ngf, image_size=cfg.crop_size,
                                z_dim=cfg.z_dim, filter_cfgs=filter_cfgs,
                                pallas_attn_threshold=thr)
        self.D = SAGANDiscriminator(ndf=cfg.ndf, image_size=cfg.crop_size,
                                    masked=self.darts, threshold=cfg.threshold,
                                    pallas_attn_threshold=thr)
        if self.distill:
            self.TG = SAGANGenerator(ngf=cfg.teacher_ngf,
                                     image_size=cfg.crop_size, z_dim=cfg.z_dim,
                                     pallas_attn_threshold=thr)
            self.TD = SAGANDiscriminator(ndf=cfg.teacher_ndf,
                                         image_size=cfg.crop_size,
                                         pallas_attn_threshold=thr)
            self.TF = TransformConvs((cfg.teacher_ngf * 4, cfg.teacher_ngf))

        self.tx_g = make_adam(0.0, 0.9)
        self.tx_d = make_adam(0.0, 0.9)
        # second Adam chains for the reference's double-added params (module
        # docstring); their counts advance 2x per step (torch-equivalent
        # bias correction for twice-processed params)
        self.tx_g_dup = make_adam(0.0, 0.9)
        self.tx_d_dup = make_adam(0.0, 0.9)
        self.tx_arch = make_adam(0.9, 0.999)
        self._jit_train = jax.jit(self._train_step, donate_argnums=0)
        self._jit_arch = jax.jit(self._arch_step, donate_argnums=0)

    @staticmethod
    def _ref_dup_param(path: str) -> bool:
        """True for params the reference adds twice to the student optimizer
        group: SpectralNorm stage convs l1-l4 (SpectralNorm wrapper + inner
        ConvTranspose2d/Conv2d both match the scan's isinstance filter) and
        Self_Attn q/k/v convs (Self_Attn + inner Conv2d). gamma, BatchNorms,
        the output layer, and transform convs appear once (SAGAN.py:315-346).
        """
        segs = path.split("/")
        return any(s in ("l1", "l2", "l3", "l4", "query_conv", "key_conv",
                         "value_conv") for s in segs)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, image_size: Optional[int] = None
                   ) -> GANState:
        size = image_size or self.cfg.crop_size
        z = jnp.zeros((1, self.cfg.z_dim), jnp.float32)
        img = jnp.zeros((1, size, size, 3), jnp.float32)
        keys = jax.random.split(rng, 8)
        nets: Dict[str, Any] = {}
        opts: Dict[str, Any] = {}
        nets["g"] = dict(self.G.init({"params": keys[0]}, z, train=True))
        nets["d"] = dict(self.D.init({"params": keys[1]}, img, train=True))
        if self.distill:
            nets["tg"] = dict(self.TG.init({"params": keys[2]}, z, train=True))
            nets["td"] = dict(self.TD.init({"params": keys[3]}, img, train=True))
            _, _, g_feats = apply_net(self.G, nets["g"], z, train=False,
                                      capture=True, update_stats=False)
            nets["tf"] = dict(self.TF.init(keys[4], g_feats))
            if self.cfg.online_distillation:
                opts["td"] = self.tx_d.init(nets["td"]["params"])
                opts["tg"] = self.tx_g.init({"g": nets["tg"]["params"]})
            g_bundle = {"g": nets["g"]["params"], "tf": nets["tf"]["params"]}
        else:
            g_bundle = {"g": nets["g"]["params"]}
        if self.distill:  # duplicate-scan branch (SAGAN.py:315-327)
            opts["g"] = (self.tx_g.init(g_bundle),
                         self.tx_g_dup.init(g_bundle))
        else:  # plain netG.parameters() (SAGAN.py:302)
            opts["g"] = self.tx_g.init(g_bundle)
        if self.darts:  # duplicate-scan branch (SAGAN.py:339-346)
            opts["d"] = (self.tx_d.init(nets["d"]["params"]),
                         self.tx_d_dup.init(nets["d"]["params"]))
        else:  # plain netD.parameters() (SAGAN.py:356)
            opts["d"] = self.tx_d.init(nets["d"]["params"])
        if self.darts:
            opts["arch"] = self.tx_arch.init(nets["d"]["arch"])
        return GANState(step=jnp.int32(0), nets=nets, opts=opts,
                        ema={"d_arch": jnp.float32(0.0)}, rng=keys[7])

    # ------------------------------------------------------------- train step

    def train_step(self, state, batch, lr):
        return self._jit_train(state, batch, jnp.float32(lr))

    def _train_step(self, state, batch, lr):
        cfg = self.cfg
        z, real = batch["z"], batch["real_img"]
        nets = dict(state.nets)
        opts = dict(state.opts)
        m: Dict[str, jax.Array] = {}
        rng = jax.random.fold_in(state.rng, state.step)

        target_feats = None
        tfake = None
        if self.distill and not cfg.online_distillation:
            # normal_distillation: frozen teacher, forward-only targets
            tfake, _, tg_feats = apply_net(self.TG, nets["tg"], z,
                                           train=False, capture=True,
                                           update_stats=False)
            _, _, td_feats = apply_net(self.TD, nets["td"], tfake,
                                       train=False, capture=True,
                                       update_stats=False)
            target_feats = [jax.lax.stop_gradient(f)
                            for f in tg_feats + td_feats]
            tfake = jax.lax.stop_gradient(tfake)
        if self.distill and cfg.online_distillation:
            tfake0, _, _ = apply_net(self.TG, nets["tg"], z, train=True,
                                     update_stats=False)

            def td_loss(td_params):
                v = {**nets["td"], "params": td_params}
                # real first (SAGAN.py:379)
                pr, pf, v = d_pair(self.TD, v, real,
                                   jax.lax.stop_gradient(tfake0),
                                   fused=self.fused_d)
                loss = gan_loss(pf, False, self.gan_mode) \
                    + gan_loss(pr, True, self.gan_mode)
                return loss, v

            (_, td_vars), gtd = jax.value_and_grad(td_loss, has_aux=True)(
                nets["td"]["params"])
            td_params, opts["td"] = adam_step(
                self.tx_d, gtd, opts["td"], nets["td"]["params"],
                jnp.float32(cfg.lr * 4))  # TTUR
            nets["td"] = {**td_vars, "params": td_params}

            def tg_loss(bundle):
                v = {**nets["tg"], "params": bundle["g"]}
                tfake2, v, tg_feats = apply_net(self.TG, v, z, train=True,
                                                capture=True)
                pf, td_v, td_feats = apply_net(self.TD, nets["td"], tfake2,
                                               capture=True)
                loss = gan_loss(pf, True, self.gan_mode,
                                for_discriminator=False)
                return loss, (v, td_v, tg_feats + td_feats, tfake2)

            (_, (tg_vars, td_vars2, tfeats, tfake)), gtg = \
                jax.value_and_grad(tg_loss, has_aux=True)(
                    {"g": nets["tg"]["params"]})
            # the TEACHER gets the sparsity injection too: teacher_opt
            # deepcopies lambda_weight/lambda_scale (train.py:93-98) and the
            # teacher's backward_G ends in L1_sparsity (SAGAN.py:494-496)
            gtg["g"] = add_sign_sparsity(gtg["g"], nets["tg"]["params"],
                                         cfg.lambda_weight, cfg.lambda_scale)
            tg_params, opts["tg"] = adam_step(
                self.tx_g, gtg, opts["tg"], {"g": nets["tg"]["params"]},
                jnp.float32(cfg.lr))
            nets["tg"] = {**tg_vars, "params": tg_params["g"]}
            nets["td"] = {**td_vars2, "params": nets["td"]["params"]}
            target_feats = [jax.lax.stop_gradient(f) for f in tfeats]
            tfake = jax.lax.stop_gradient(tfake)

        fake, _, _ = apply_net(self.G, nets["g"], z, train=True,
                               update_stats=False)

        def d_loss(d_params):
            v = {**nets["d"], "params": d_params}
            pr, pf, v = d_pair(self.D, v, real,
                               jax.lax.stop_gradient(fake),
                               fused=self.fused_d)
            lf = gan_loss(pf, False, self.gan_mode)
            lr_ = gan_loss(pr, True, self.gan_mode)
            return lf + lr_, (v, lf, lr_)

        (_, (d_vars, lf, lr_)), gd = jax.value_and_grad(
            d_loss, has_aux=True)(nets["d"]["params"])
        if self.darts:  # TTUR + reference double-added spectral/attn convs
            d_params, opts["d"] = dup_adam_step(
                self.tx_d, self.tx_d_dup, gd, opts["d"], nets["d"]["params"],
                lr * 4, dup_path_mask(nets["d"]["params"],
                                      self._ref_dup_param))
        else:
            d_params, opts["d"] = adam_step(self.tx_d, gd, opts["d"],
                                            nets["d"]["params"], lr * 4)
        nets["d"] = {**d_vars, "params": d_params}
        m["D_fake"], m["D_real"] = lf, lr_

        def g_loss(bundle):
            v = {**nets["g"], "params": bundle["g"]}
            fake2, v, g_feats = apply_net(self.G, v, z, train=True,
                                          capture=True)
            pf, d_v, _ = apply_net(self.D, nets["d"], fake2)
            l_gan = gan_loss(pf, True, self.gan_mode, for_discriminator=False)
            loss = l_gan
            aux_m = {"G_GAN": l_gan}
            td_v = None
            if self.distill:
                transformed = self.TF.apply({"params": bundle["tf"]}, g_feats)
                _, td_v, sd_feats = apply_net(self.TD, nets["td"], fake2,
                                              capture=True)
                content, gram_l = distill_losses(
                    transformed + sd_feats, target_feats, use_sqrt=True)
                aux_m["content"] = cfg.lambda_content * content
                aux_m["gram"] = cfg.lambda_gram * gram_l
                aux_m["L1"] = cfg.lambda_L1 * l1(fake2, tfake)
                loss = loss + aux_m["content"] + aux_m["gram"] + aux_m["L1"]
            return loss, (v, d_v, td_v, aux_m)

        g_bundle = {"g": nets["g"]["params"]}
        if self.distill:
            g_bundle["tf"] = nets["tf"]["params"]
        (_, (g_vars, d_vars2, td_vars3, aux_m)), gg = jax.value_and_grad(
            g_loss, has_aux=True)(g_bundle)
        gg["g"] = add_sign_sparsity(gg["g"], g_bundle["g"],
                                    cfg.lambda_weight, cfg.lambda_scale)
        if self.distill:  # reference double-added spectral/attn convs
            new_bundle, opts["g"] = dup_adam_step(
                self.tx_g, self.tx_g_dup, gg, opts["g"], g_bundle, lr,
                dup_path_mask(g_bundle, self._ref_dup_param))
        else:
            new_bundle, opts["g"] = adam_step(self.tx_g, gg, opts["g"],
                                              g_bundle, lr)
        nets["g"] = {**g_vars, "params": new_bundle["g"]}
        nets["d"] = {**d_vars2, "params": nets["d"]["params"]}
        if self.distill:
            nets["tf"] = {"params": new_bundle["tf"]}
            nets["td"] = {**td_vars3, "params": nets["td"]["params"]}
        m.update(aux_m)

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
        z, real = batch["z"], batch["real_img"]
        nets = dict(state.nets)
        opts = dict(state.opts)
        ema = dict(state.ema)
        rng = jax.random.fold_in(state.rng, state.step + 17)

        alphas = clip_alphas(nets["d"]["arch"])
        fake, g_vars, _ = apply_net(self.G, nets["g"], z, train=True)
        nets["g"] = g_vars
        tfake, tg_vars, _ = apply_net(self.TG, nets["tg"], z, train=True)
        nets["tg"] = tg_vars

        tpf, td_v, _ = apply_net(self.TD, nets["td"],
                                 jax.lax.stop_gradient(tfake))
        _, td_v, _ = apply_net(self.TD, td_v, real)
        nets["td"] = td_v
        t_disc = discrepancy(tpf, self.gan_mode)
        ema["d_arch"] = ema_update(ema["d_arch"], t_disc, ema_beta)
        target = jax.lax.stop_gradient(ema["d_arch"])

        def arch_loss(a):
            v = {**nets["d"], "arch": a}
            pf, v, _ = apply_net(self.D, v, jax.lax.stop_gradient(fake))
            s_disc = discrepancy(pf, self.gan_mode)
            pr, v, _ = apply_net(self.D, v, real)
            l_fake = gan_loss(pf, False, self.gan_mode)
            l_real = gan_loss(pr, True, self.gan_mode)
            # unhalved GAN terms (SAGAN.py:394)
            return jnp.abs(s_disc - target) + l_real + l_fake, (v, s_disc)

        (loss_arch, (d_vars, s_disc)), ga = jax.value_and_grad(
            arch_loss, has_aux=True)(alphas)
        new_alphas, opts["arch"] = adam_step(self.tx_arch, ga, opts["arch"],
                                             alphas, arch_lr)
        nets["d"] = {**d_vars, "arch": new_alphas}

        new_state = GANState(step=state.step, nets=nets, opts=opts, ema=ema,
                             rng=rng)
        return new_state, {"D_arch": loss_arch, "D_arch_diff": s_disc,
                           "teacher_D_arch_diff": ema["d_arch"]}

    # ------------------------------------------------------------------ eval

    def generate(self, state: GANState, z: jax.Array,
                 teacher: bool = False) -> jax.Array:
        return self._generate(state, z, teacher)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _generate(self, state, z, teacher=False):
        net, mod = (state.nets["tg"], self.TG) if teacher \
            else (state.nets["g"], self.G)
        out, _, _ = apply_net(mod, net, z, train=False, update_stats=False)
        return out

    # ------------------------------------------------------------- checkpoint

    def checkpoint_payload(self, state, epoch, metric=None) -> dict:
        return {"G": state.nets["g"], "D": state.nets["d"], "epoch": epoch,
                "cfg": (self.filter_cfgs, self.channel_cfgs), "fid": metric}

    def load_net_params(self, state, ckpt, load_discriminator=True):
        nets = dict(state.nets)
        nets["g"] = ckpt["G"]
        if load_discriminator and ckpt.get("D") is not None:
            nets["d"] = ckpt["D"]
        return state.replace(nets=nets)
