"""Pix2Pix engine: conditional GAN + L1 with online distillation and
DARTS-searched discriminator (models/Pix2Pix.py:350-952, train.py:123-173).

One jitted cooperative train step per iteration:
  teacher G fwd -> teacher D update -> teacher G update (features captured)
  -> student D update -> student G update (GAN + L1 + content/gram distill
  + optional L1-sparsity gradient injection)
and a separate jitted arch step on a validation batch (train.py:147-151):
  clip alphas -> teacher discrepancy EMA -> L1(student disc, EMA) + D GAN
  terms -> Adam over mask alphas only.

Semantics preserved from the reference:
  * update order D-then-G (Pix2Pix.py:565-583)
  * teacher trains online on the same batch at constant LR (its scheduler is
    never stepped, train.py:172 + Pix2Pix.py:606-614)
  * distillation targets: teacher G features from the teacher's own forward
    and teacher-D features of the teacher fake, both post-teacher-D-update;
    student side compared via 1x1 transforms + teacher-D on student fake
    (Pix2Pix.py:528-548)
  * BN running-stat update counts per forward match torch train-mode
  * Adam(2e-4, (0.5, 0.999)); arch Adam(arch_lr, (0.9, 0.999))
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gcc_tpu.config import Config
from gcc_tpu.engines.common import (
    CombinedStepMixin, GANState, adam_step, add_sign_sparsity, apply_net,
    d_pair, discrepancy, distill_losses, ema_update, make_adam,
)
from gcc_tpu.losses import gan_loss, l1
from gcc_tpu.models.generators import MobileResnetGenerator, UnetGenerator
from gcc_tpu.models.discriminators import PatchGAN
from gcc_tpu.ops.layers import Conv
from gcc_tpu.ops.mask import clip_alphas


class TransformConvs(nn.Module):
    """1x1 student->teacher width adapters (Pix2Pix.py:402-415), bias-free."""

    out_widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, feats):
        return [Conv(w, (1, 1), (1, 1), 0, use_bias=False, name=f"tf_{i}")(f)
                for i, (w, f) in enumerate(zip(self.out_widths, feats))]


class Pix2PixEngine(CombinedStepMixin):
    """Duck-typed engine surface shared by all four families."""

    loss_names = ["G_GAN", "G_L1", "D_real", "D_fake"]
    visual_names = ["real_A", "fake_B", "real_B"]

    def __init__(self, cfg: Config, filter_cfgs=None, channel_cfgs=None):
        self.cfg = cfg
        self.filter_cfgs = filter_cfgs
        self.channel_cfgs = channel_cfgs
        self.distill = cfg.online_distillation or cfg.normal_distillation
        self.darts = cfg.darts_discriminator
        self.gan_mode = cfg.gan_mode
        self.fused_d = cfg.fused_d_batch

        fb = {"auto": None, "on": True, "off": False}[cfg.fused_resblock]
        if cfg.backbone == "resnet":
            self.G = MobileResnetGenerator(output_nc=cfg.output_nc,
                                           ngf=cfg.ngf, cfg=filter_cfgs,
                                           use_fused_blocks=fb)
        else:
            self.G = UnetGenerator(output_nc=cfg.output_nc,
                                   num_downs=cfg.num_downs, ngf=cfg.ngf,
                                   use_dropout=not cfg.no_dropout,
                                   filter_cfgs=filter_cfgs,
                                   channel_cfgs=channel_cfgs)
        self.D = PatchGAN(ndf=cfg.ndf, norm="batch", masked=self.darts,
                          threshold=cfg.threshold)
        if self.distill:
            if cfg.backbone == "resnet":
                t_widths = (cfg.teacher_ngf * 4,) * 4
                self.TG = MobileResnetGenerator(output_nc=cfg.output_nc,
                                                ngf=cfg.teacher_ngf,
                                                use_fused_blocks=fb)
            else:
                t_widths = (cfg.teacher_ngf * 2, cfg.teacher_ngf * 8,
                            cfg.teacher_ngf * 16, cfg.teacher_ngf * 4)
                self.TG = UnetGenerator(output_nc=cfg.output_nc,
                                        num_downs=cfg.num_downs,
                                        ngf=cfg.teacher_ngf,
                                        use_dropout=not cfg.no_dropout)
            self.TD = PatchGAN(ndf=cfg.teacher_ndf, norm="batch", masked=False)
            self.TF = TransformConvs(t_widths)

        self.tx_g = make_adam(0.5, 0.999)
        self.tx_d = make_adam(0.5, 0.999)
        self.tx_arch = make_adam(0.9, 0.999)
        self._jit_train = jax.jit(self._train_step, donate_argnums=0)
        self._jit_arch = jax.jit(self._arch_step, donate_argnums=0)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, image_size: Optional[int] = None
                   ) -> GANState:
        size = image_size or self.cfg.crop_size
        a = jnp.zeros((1, size, size, self.cfg.input_nc), jnp.float32)
        ab = jnp.zeros((1, size, size,
                        self.cfg.input_nc + self.cfg.output_nc), jnp.float32)
        keys = jax.random.split(rng, 8)
        nets: Dict[str, Any] = {}
        opts: Dict[str, Any] = {}

        nets["g"] = dict(self.G.init(
            {"params": keys[0], "dropout": keys[1]}, a, train=True))
        nets["d"] = dict(self.D.init({"params": keys[2]}, ab, train=True))
        if self.distill:
            nets["tg"] = dict(self.TG.init(
                {"params": keys[3], "dropout": keys[4]}, a, train=True))
            nets["td"] = dict(self.TD.init({"params": keys[5]}, ab, train=True))
            _, _, g_feats = apply_net(self.G, nets["g"], a, train=False,
                                      capture=True, update_stats=False)
            nets["tf"] = dict(self.TF.init(keys[6], g_feats))
            if self.cfg.online_distillation:
                opts["td"] = self.tx_d.init(nets["td"]["params"])
                opts["tg"] = self.tx_g.init({"g": nets["tg"]["params"]})
            g_bundle = {"g": nets["g"]["params"], "tf": nets["tf"]["params"]}
        else:
            g_bundle = {"g": nets["g"]["params"]}
        opts["g"] = self.tx_g.init(g_bundle)
        opts["d"] = self.tx_d.init(nets["d"]["params"])
        if self.darts:
            opts["arch"] = self.tx_arch.init(nets["d"]["arch"])
        ema = {"d_arch": jnp.float32(0.0)}
        return GANState(step=jnp.int32(0), nets=nets, opts=opts, ema=ema,
                        rng=keys[7])

    # ------------------------------------------------------------- train step

    def train_step(self, state: GANState, batch: Dict[str, jax.Array],
                   lr: float) -> Tuple[GANState, Dict[str, jax.Array]]:
        return self._jit_train(state, batch, jnp.float32(lr))

    def _train_step(self, state, batch, lr):
        cfg = self.cfg
        A, B = batch["A"], batch["B"]
        nets = dict(state.nets)
        opts = dict(state.opts)
        m: Dict[str, jax.Array] = {}
        rng, drng, tdrng = jax.random.split(state.rng, 3)

        target_feats = None
        if self.distill and not self.cfg.online_distillation:
            # normal_distillation: frozen teacher, forward-only targets.
            # (The reference's flag is dead code — train.py:92 only attaches
            # a teacher under online_distillation — implemented properly.)
            tfake, _, tg_feats = apply_net(self.TG, nets["tg"], A,
                                           train=False, capture=True,
                                           update_stats=False)
            _, _, td_feats = apply_net(
                self.TD, nets["td"], jnp.concatenate([A, tfake], -1),
                train=False, capture=True, update_stats=False)
            target_feats = [jax.lax.stop_gradient(f)
                            for f in tg_feats + td_feats]
        if self.distill and self.cfg.online_distillation:
            # ---- teacher forward (tfake for its D update) ----
            tfake, _, _ = apply_net(self.TG, nets["tg"], A, train=True,
                                    rngs={"dropout": tdrng},
                                    update_stats=False)

            # ---- teacher D update (D-then-G order, Pix2Pix.py:565-583) ----
            def td_loss(td_params):
                v = {**nets["td"], "params": td_params}
                pf, pr, v = d_pair(
                    self.TD, v,
                    jnp.concatenate([A, jax.lax.stop_gradient(tfake)], -1),
                    jnp.concatenate([A, B], -1), fused=self.fused_d)
                loss = (gan_loss(pf, False, self.gan_mode)
                        + gan_loss(pr, True, self.gan_mode)) * 0.5
                return loss, v

            (_, td_vars), gtd = jax.value_and_grad(td_loss, has_aux=True)(
                nets["td"]["params"])
            td_params, opts["td"] = adam_step(
                self.tx_d, gtd, opts["td"], nets["td"]["params"],
                jnp.float32(cfg.lr))  # teacher LR is never scheduled
            nets["td"] = {**td_vars, "params": td_params}

            # ---- teacher G update; capture distillation targets ----
            def tg_loss(bundle):
                v = {**nets["tg"], "params": bundle["g"]}
                tfake2, v, tg_feats = apply_net(
                    self.TG, v, A, train=True, capture=True,
                    rngs={"dropout": tdrng})
                pf, td_v, td_feats = apply_net(
                    self.TD, nets["td"], jnp.concatenate([A, tfake2], -1),
                    capture=True)
                loss = gan_loss(pf, True, self.gan_mode,
                                for_discriminator=False) \
                    + cfg.lambda_L1 * l1(tfake2, B)
                return loss, (v, td_v, tg_feats + td_feats, tfake2)

            (_, (tg_vars, td_vars2, tfeats, tfake)), gtg = \
                jax.value_and_grad(tg_loss, has_aux=True)(
                    {"g": nets["tg"]["params"]})
            # the TEACHER gets the sparsity injection too: teacher_opt
            # deepcopies lambda_weight/lambda_scale (train.py:93-98) and the
            # teacher's backward_G ends in L1_sparsity (Pix2Pix.py:552)
            gtg["g"] = add_sign_sparsity(gtg["g"], nets["tg"]["params"],
                                         cfg.lambda_weight, cfg.lambda_scale)
            tg_params, opts["tg"] = adam_step(
                self.tx_g, gtg, opts["tg"], {"g": nets["tg"]["params"]},
                jnp.float32(cfg.lr))
            nets["tg"] = {**tg_vars, "params": tg_params["g"]}
            nets["td"] = {**td_vars2, "params": nets["td"]["params"]}
            target_feats = [jax.lax.stop_gradient(f) for f in tfeats]

        # ---- student forward (fake for D update) ----
        fake, _, _ = apply_net(self.G, nets["g"], A, train=True,
                               rngs={"dropout": drng}, update_stats=False)

        # ---- student D update (alphas are constants here) ----
        def d_loss(d_params):
            v = {**nets["d"], "params": d_params}
            pf, pr, v = d_pair(
                self.D, v,
                jnp.concatenate([A, jax.lax.stop_gradient(fake)], -1),
                jnp.concatenate([A, B], -1), fused=self.fused_d)
            lf = gan_loss(pf, False, self.gan_mode)
            lr_ = gan_loss(pr, True, self.gan_mode)
            return (lf + lr_) * 0.5, (v, lf, lr_)

        (_, (d_vars, lf, lr_)), gd = jax.value_and_grad(
            d_loss, has_aux=True)(nets["d"]["params"])
        d_params, opts["d"] = adam_step(self.tx_d, gd, opts["d"],
                                        nets["d"]["params"], lr)
        nets["d"] = {**d_vars, "params": d_params}
        m["D_fake"], m["D_real"] = lf, lr_

        # ---- student G update ----
        def g_loss(bundle):
            v = {**nets["g"], "params": bundle["g"]}
            fake2, v, g_feats = apply_net(self.G, v, A, train=True,
                                          capture=True,
                                          rngs={"dropout": drng})
            pf, d_v, _ = apply_net(self.D, nets["d"],
                                   jnp.concatenate([A, fake2], -1))
            l_gan = gan_loss(pf, True, self.gan_mode, for_discriminator=False)
            l_l1 = cfg.lambda_L1 * l1(fake2, B)
            loss = l_gan + l_l1
            aux_m = {"G_GAN": l_gan, "G_L1": l_l1}
            td_v = None
            if self.distill:
                transformed = self.TF.apply({"params": bundle["tf"]}, g_feats)
                _, td_v, sd_feats = apply_net(
                    self.TD, nets["td"], jnp.concatenate([A, fake2], -1),
                    capture=True)
                content, gram_l = distill_losses(
                    transformed + sd_feats, target_feats, use_sqrt=True)
                aux_m["content"] = cfg.lambda_content * content
                aux_m["gram"] = cfg.lambda_gram * gram_l
                loss = loss + aux_m["content"] + aux_m["gram"]
            return loss, (v, d_v, td_v, fake2, aux_m)

        g_bundle = {"g": nets["g"]["params"]}
        if self.distill:
            g_bundle["tf"] = nets["tf"]["params"]
        (_, (g_vars, d_vars2, td_vars3, fake, aux_m)), gg = \
            jax.value_and_grad(g_loss, has_aux=True)(g_bundle)
        gg["g"] = add_sign_sparsity(gg["g"], g_bundle["g"],
                                    cfg.lambda_weight, cfg.lambda_scale)
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

    def arch_step(self, state: GANState, batch: Dict[str, jax.Array],
                  ema_beta: float, arch_lr: float = None
                  ) -> Tuple[GANState, Dict[str, jax.Array]]:
        if arch_lr is None:
            arch_lr = self.cfg.arch_lr
        return self._jit_arch(state, batch, jnp.float32(ema_beta),
                              jnp.float32(arch_lr))

    def _arch_step(self, state, batch, ema_beta, arch_lr):
        """clipping_mask_alpha + optimizer_netD_arch on a val batch
        (train.py:147-151, Pix2Pix.py:479-511, 585-593)."""
        cfg = self.cfg
        A, B = batch["A"], batch["B"]
        nets = dict(state.nets)
        opts = dict(state.opts)
        ema = dict(state.ema)
        rng, drng, tdrng = jax.random.split(state.rng, 3)

        alphas = clip_alphas(nets["d"]["arch"])

        # student + teacher generator forwards (train mode, stats update)
        fake, g_vars, _ = apply_net(self.G, nets["g"], A, train=True,
                                    rngs={"dropout": drng})
        nets["g"] = g_vars
        tfake, tg_vars, _ = apply_net(self.TG, nets["tg"], A, train=True,
                                      rngs={"dropout": tdrng})
        nets["tg"] = tg_vars

        # teacher discrepancy EMA (Pix2Pix.py:489-511)
        tpf, td_v, _ = apply_net(self.TD, nets["td"], jnp.concatenate(
            [A, jax.lax.stop_gradient(tfake)], -1))
        _, td_v, _ = apply_net(self.TD, td_v, jnp.concatenate([A, B], -1))
        nets["td"] = td_v
        t_disc = discrepancy(tpf, self.gan_mode)
        ema["d_arch"] = ema_update(ema["d_arch"], t_disc, ema_beta)
        target = jax.lax.stop_gradient(ema["d_arch"])

        def arch_loss(a):
            v = {**nets["d"], "arch": a}
            pf, v, _ = apply_net(self.D, v, jnp.concatenate(
                [A, jax.lax.stop_gradient(fake)], -1))
            s_disc = discrepancy(pf, self.gan_mode)
            pr, v, _ = apply_net(self.D, v, jnp.concatenate([A, B], -1))
            l_fake = gan_loss(pf, False, self.gan_mode)
            l_real = gan_loss(pr, True, self.gan_mode)
            loss = jnp.abs(s_disc - target) + (l_real + l_fake) * 0.5
            return loss, (v, s_disc)

        (loss_arch, (d_vars, s_disc)), ga = jax.value_and_grad(
            arch_loss, has_aux=True)(alphas)
        new_alphas, opts["arch"] = adam_step(self.tx_arch, ga, opts["arch"],
                                             alphas, arch_lr)
        nets["d"] = {**d_vars, "arch": new_alphas}

        new_state = GANState(step=state.step, nets=nets, opts=opts, ema=ema,
                             rng=rng)
        metrics = {"D_arch": loss_arch, "D_arch_diff": s_disc,
                   "teacher_D_arch_diff": ema["d_arch"]}
        return new_state, metrics

    # ------------------------------------------------------------------ eval

    def generate(self, state: GANState, A: jax.Array,
                 teacher: bool = False) -> jax.Array:
        return self._generate(state, A, teacher)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _generate(self, state, A, teacher=False):
        net, mod = (state.nets["tg"], self.TG) if teacher \
            else (state.nets["g"], self.G)
        out, _, _ = apply_net(mod, net, A, train=False, update_stats=False)
        return out

    # ------------------------------------------------------------- checkpoint

    def checkpoint_payload(self, state: GANState, epoch: int,
                           metric=None) -> dict:
        """Reference ckpt contract: G/D + epoch + cfg + metric
        (Pix2Pix.py:636-649), plus full state for true resume."""
        return {
            "G": state.nets["g"],
            "D": state.nets["d"],
            "epoch": epoch,
            "cfg": (self.filter_cfgs, self.channel_cfgs),
            "fid": metric,
        }

    def load_net_params(self, state: GANState, ckpt: dict,
                        load_discriminator: bool = True) -> GANState:
        nets = dict(state.nets)
        nets["g"] = ckpt["G"]
        if load_discriminator and "D" in ckpt and ckpt["D"] is not None:
            nets["d"] = ckpt["D"]
        return state.replace(nets=nets)
