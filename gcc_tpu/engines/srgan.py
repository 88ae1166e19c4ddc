"""SRGAN engine: SRResNet + VGG-perceptual GAN for 4x super-resolution with
online distillation (models/SRGAN.py:297-831).

Semantics preserved:
  * G-then-D update order (SRGAN.py:483-502); D loss = lr + lf, unhalved
  * G loss = lambda_SR_content * MSE(fake, hr) + lambda_SR_adversarial *
    vanilla GAN + lambda_SR_perceptual * MSE in VGG19(5,4) space; the GAN/VGG
    terms operate on imagenet-normalized images (SRGAN.py:442-454), as does
    the discriminator in backward_D (the reference mutates real_hr/fake_hr
    in-place during backward_G, so its D only ever sees imagenet-norm)
  * generator_only pretrain path = plain MSE + sparsity injection
    (optimize_content_parameters, SRGAN.py:514-522; the flag itself is a
    reference latent bug — never declared in options.py — fixed here)
  * distill: 4 transformed G features + teacher-D features of the student
    fake (imagenet space), sqrt(MSE), plus lambda_L1 * L1 to the teacher fake
  * Adam(1e-4, (0.9, 0.999)) everywhere; teacher LR constant
  * lottery_transplant implements the lottery-ticket warm start the reference
    calls but never defines (SRGAN.py:795-796 calls pruned_model.lottery_theory
    which does not exist) — kept-channel weights are copied from the sparse
    checkpoint into the pruned student.

Deviation (documented): the reference's distillation optimizer accidentally
excludes PReLU alphas from G updates (SRGAN.py:349-352 isinstance filter);
here all generator parameters train.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gcc_tpu.config import Config
from gcc_tpu.engines.common import (
    CombinedStepMixin, GANState, adam_step, add_sign_sparsity, apply_net,
    d_pair, discrepancy, distill_losses, ema_update, make_adam,
)
from gcc_tpu.engines.pix2pix import TransformConvs
from gcc_tpu.losses import gan_loss, l1, mse
from gcc_tpu.metrics.vgg import TruncatedVGG19, to_imagenet_norm
from gcc_tpu.models.generators import SRResNet
from gcc_tpu.models.discriminators import SRGANDiscriminator
from gcc_tpu.ops.mask import clip_alphas


class SRGANEngine(CombinedStepMixin):
    visual_names = ["real_lr", "fake_hr", "real_hr"]

    def __init__(self, cfg: Config, filter_cfgs=None, channel_cfgs=None,
                 vgg_params: Optional[dict] = None):
        self.cfg = cfg
        self.filter_cfgs = filter_cfgs
        self.channel_cfgs = channel_cfgs
        self.distill = cfg.online_distillation or cfg.normal_distillation
        self.darts = cfg.darts_discriminator
        self.gan_mode = cfg.gan_mode
        self.fused_d = cfg.fused_d_batch
        self.generator_only = cfg.generator_only

        self.G = SRResNet(n_channels=cfg.ngf, scaling_factor=cfg.upscale_factor,
                          filter_cfgs=filter_cfgs)
        self.D = SRGANDiscriminator(ndf=cfg.ndf, masked=self.darts,
                                    threshold=cfg.threshold)
        self.vgg = TruncatedVGG19()
        if vgg_params is None and cfg.vgg_path:
            from gcc_tpu.metrics.vgg import load_torch_vgg19
            vgg_params = load_torch_vgg19(cfg.vgg_path)
        self.vgg_params = vgg_params
        # The reference's perceptual term runs in *pretrained* VGG19(5,4)
        # space (models/SRGAN.py:330,451-453). Random-feature perceptual loss
        # is a different algorithm, so without weights the term is DISABLED
        # (weight 0), loudly — not silently proxied.
        self.vgg_enabled = vgg_params is not None
        if not self.vgg_enabled and cfg.lambda_SR_perceptual:
            import logging
            logging.getLogger("gcc_tpu").warning(
                "SRGAN perceptual loss DISABLED: no pretrained VGG19 weights "
                "(--vgg_path). The reference uses torchvision's pretrained "
                "VGG19(5,4); training proceeds with content+adversarial only.")
        if self.distill:
            self.TG = SRResNet(n_channels=cfg.teacher_ngf,
                               scaling_factor=cfg.upscale_factor)
            self.TD = SRGANDiscriminator(ndf=cfg.teacher_ndf)
            self.TF = TransformConvs((cfg.teacher_ngf,) * 4)

        self.tx_g = make_adam(0.9, 0.999)
        self.tx_d = make_adam(0.9, 0.999)
        self.tx_arch = make_adam(0.9, 0.999)
        self._jit_train = jax.jit(self._train_step, donate_argnums=0)
        self._jit_arch = jax.jit(self._arch_step, donate_argnums=0)
        self._jit_content = jax.jit(self._content_step, donate_argnums=0)

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array, image_size: Optional[int] = None
                   ) -> GANState:
        hr = image_size or self.cfg.image_size
        lr_size = hr // self.cfg.upscale_factor
        lr_img = jnp.zeros((1, lr_size, lr_size, 3), jnp.float32)
        hr_img = jnp.zeros((1, hr, hr, 3), jnp.float32)
        keys = jax.random.split(rng, 8)
        nets: Dict[str, Any] = {}
        opts: Dict[str, Any] = {}
        nets["g"] = dict(self.G.init({"params": keys[0]}, lr_img, train=True))
        nets["d"] = dict(self.D.init({"params": keys[1]}, hr_img, train=True))
        if self.distill:
            nets["tg"] = dict(self.TG.init({"params": keys[2]}, lr_img,
                                           train=True))
            nets["td"] = dict(self.TD.init({"params": keys[3]}, hr_img,
                                           train=True))
            _, _, g_feats = apply_net(self.G, nets["g"], lr_img, train=False,
                                      capture=True, update_stats=False)
            nets["tf"] = dict(self.TF.init(keys[4], g_feats))
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
        return GANState(step=jnp.int32(0), nets=nets, opts=opts,
                        ema={"d_arch": jnp.float32(0.0)}, rng=keys[7])

    # ------------------------------------------------------------- train step

    def train_step(self, state, batch, lr):
        if self.generator_only:
            return self._jit_content(state, batch, jnp.float32(lr))
        return self._jit_train(state, batch, jnp.float32(lr))

    @property
    def train_jit(self):
        return self._jit_content if self.generator_only else self._jit_train

    def _perceptual(self, fake_in, real_in):
        if not self.vgg_enabled:
            return jnp.float32(0.0)
        f = self.vgg.apply({"params": self.vgg_params}, fake_in)
        r = self.vgg.apply({"params": self.vgg_params}, real_in)
        return mse(f, jax.lax.stop_gradient(r))

    def _content_step(self, state, batch, lr):
        """optimize_content_parameters: MSE-only pretrain (SRGAN.py:514-522)."""
        cfg = self.cfg
        lr_img, hr_img = batch["lr"], batch["hr"]
        nets = dict(state.nets)
        opts = dict(state.opts)

        def loss_fn(bundle):
            v = {**nets["g"], "params": bundle["g"]}
            fake, v, _ = apply_net(self.G, v, lr_img, train=True)
            return mse(fake, hr_img), v

        (l, g_vars), gg = jax.value_and_grad(loss_fn, has_aux=True)(
            {"g": nets["g"]["params"]})
        gg["g"] = add_sign_sparsity(gg["g"], nets["g"]["params"],
                                    cfg.lambda_weight, cfg.lambda_scale)
        new_bundle, opts["g"] = adam_step(
            self.tx_g, gg, opts["g"], {"g": nets["g"]["params"]}, lr)
        nets["g"] = {**g_vars, "params": new_bundle["g"]}
        new_state = GANState(step=state.step + 1, nets=nets, opts=opts,
                             ema=state.ema, rng=state.rng)
        return new_state, {"content": jnp.asarray(l, jnp.float32)}

    def _train_step(self, state, batch, lr):
        cfg = self.cfg
        lr_img, hr_img = batch["lr"], batch["hr"]
        real_in = to_imagenet_norm(hr_img)
        nets = dict(state.nets)
        opts = dict(state.opts)
        m: Dict[str, jax.Array] = {}

        target_feats = None
        t_fake_in = None
        if self.distill and not cfg.online_distillation:
            # normal_distillation: frozen teacher, forward-only targets
            tfake, _, tg_feats = apply_net(self.TG, nets["tg"], lr_img,
                                           train=False, capture=True,
                                           update_stats=False)
            t_fake_in = jax.lax.stop_gradient(to_imagenet_norm(tfake))
            _, _, td_feats = apply_net(self.TD, nets["td"], t_fake_in,
                                       train=False, capture=True,
                                       update_stats=False)
            target_feats = [jax.lax.stop_gradient(f)
                            for f in tg_feats + td_feats]
        if self.distill and cfg.online_distillation:
            tfake, _, _ = apply_net(self.TG, nets["tg"], lr_img, train=True,
                                    update_stats=False)
            t_fake_in = to_imagenet_norm(tfake)

            # ---- teacher G update (G-then-D order) ----
            def tg_loss(bundle):
                v = {**nets["tg"], "params": bundle["g"]}
                tfake2, v, tg_feats = apply_net(self.TG, v, lr_img,
                                                train=True, capture=True)
                fake_in = to_imagenet_norm(tfake2)
                pf, td_v, _ = apply_net(self.TD, nets["td"], fake_in)
                loss = cfg.lambda_SR_content * mse(tfake2, hr_img) \
                    + cfg.lambda_SR_adversarial * gan_loss(
                        pf, True, self.gan_mode, for_discriminator=False) \
                    + cfg.lambda_SR_perceptual * self._perceptual(
                        fake_in, real_in)
                return loss, (v, td_v, tg_feats)

            (_, (tg_vars, td_v0, tg_feats)), gtg = jax.value_and_grad(
                tg_loss, has_aux=True)({"g": nets["tg"]["params"]})
            tg_params, opts["tg"] = adam_step(
                self.tx_g, gtg, opts["tg"], {"g": nets["tg"]["params"]},
                jnp.float32(cfg.lr))
            nets["tg"] = {**tg_vars, "params": tg_params["g"]}
            nets["td"] = {**td_v0, "params": nets["td"]["params"]}

            # ---- teacher D update; capture target D feats on teacher fake
            # (last TD forward of the teacher step, SRGAN.py:397-405) ----
            def td_loss(td_params):
                v = {**nets["td"], "params": td_params}
                pr, pf, v, td_feats = d_pair(
                    self.TD, v, real_in,
                    jax.lax.stop_gradient(t_fake_in),
                    fused=self.fused_d, capture_b=True)
                loss = gan_loss(pr, True, self.gan_mode) \
                    + gan_loss(pf, False, self.gan_mode)
                return loss, (v, td_feats)

            (_, (td_vars, td_feats)), gtd = jax.value_and_grad(
                td_loss, has_aux=True)(nets["td"]["params"])
            td_params, opts["td"] = adam_step(
                self.tx_d, gtd, opts["td"], nets["td"]["params"],
                jnp.float32(cfg.lr))
            nets["td"] = {**td_vars, "params": td_params}
            target_feats = [jax.lax.stop_gradient(f)
                            for f in tg_feats + td_feats]
            t_fake_in = jax.lax.stop_gradient(t_fake_in)

        # ---- student G update (first: G-then-D, SRGAN.py:483-502) ----
        def g_loss(bundle):
            v = {**nets["g"], "params": bundle["g"]}
            fake, v, g_feats = apply_net(self.G, v, lr_img, train=True,
                                         capture=True)
            fake_in = to_imagenet_norm(fake)
            pf, d_v, _ = apply_net(self.D, nets["d"], fake_in)
            l_content = cfg.lambda_SR_content * mse(fake, hr_img)
            l_gan = cfg.lambda_SR_adversarial * gan_loss(
                pf, True, self.gan_mode, for_discriminator=False)
            l_perc = cfg.lambda_SR_perceptual * self._perceptual(
                fake_in, real_in)
            loss = l_content + l_gan + l_perc
            aux_m = {"content": l_content, "G_GAN": l_gan,
                     "perceptual": l_perc}
            td_v = None
            if self.distill:
                transformed = self.TF.apply({"params": bundle["tf"]}, g_feats)
                _, td_v, sd_feats = apply_net(self.TD, nets["td"], fake_in,
                                              capture=True)
                d_content, d_gram = distill_losses(
                    transformed + sd_feats, target_feats, use_sqrt=True)
                aux_m["distill_content"] = cfg.lambda_content * d_content
                aux_m["gram"] = cfg.lambda_gram * d_gram
                aux_m["L1"] = cfg.lambda_L1 * l1(fake_in, t_fake_in)
                loss = loss + aux_m["distill_content"] + aux_m["gram"] \
                    + aux_m["L1"]
            return loss, (v, d_v, td_v, fake_in, aux_m)

        g_bundle = {"g": nets["g"]["params"]}
        if self.distill:
            g_bundle["tf"] = nets["tf"]["params"]
        (_, (g_vars, d_vars0, td_vars3, fake_in, aux_m)), gg = \
            jax.value_and_grad(g_loss, has_aux=True)(g_bundle)
        # NO sparsity injection on the GAN path: SRGAN's backward_G does not
        # call L1_sparsity (SRGAN.py:442-481) — only the generator-only
        # content path does (SRGAN.py:515-521, handled above)
        new_bundle, opts["g"] = adam_step(self.tx_g, gg, opts["g"],
                                          g_bundle, lr)
        nets["g"] = {**g_vars, "params": new_bundle["g"]}
        nets["d"] = {**d_vars0, "params": nets["d"]["params"]}
        if self.distill:
            nets["tf"] = {"params": new_bundle["tf"]}
            nets["td"] = {**td_vars3, "params": nets["td"]["params"]}
        m.update(aux_m)
        fake_in = jax.lax.stop_gradient(fake_in)

        # ---- student D update ----
        def d_loss(d_params):
            v = {**nets["d"], "params": d_params}
            pr, pf, v = d_pair(self.D, v, real_in, fake_in,
                               fused=self.fused_d)
            lf = gan_loss(pf, False, self.gan_mode)
            lr_ = gan_loss(pr, True, self.gan_mode)
            return lf + lr_, (v, lf, lr_)

        (_, (d_vars, lf, lr_)), gd = jax.value_and_grad(
            d_loss, has_aux=True)(nets["d"]["params"])
        d_params, opts["d"] = adam_step(self.tx_d, gd, opts["d"],
                                        nets["d"]["params"], lr)
        nets["d"] = {**d_vars, "params": d_params}
        m["D_fake"], m["D_real"] = lf, lr_

        new_state = GANState(step=state.step + 1, nets=nets, opts=opts,
                             ema=state.ema, rng=state.rng)
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
        lr_img, hr_img = batch["lr"], batch["hr"]
        real_in = to_imagenet_norm(hr_img)
        nets = dict(state.nets)
        opts = dict(state.opts)
        ema = dict(state.ema)

        alphas = clip_alphas(nets["d"]["arch"])
        fake, g_vars, _ = apply_net(self.G, nets["g"], lr_img, train=True)
        nets["g"] = g_vars
        tfake, tg_vars, _ = apply_net(self.TG, nets["tg"], lr_img, train=True)
        nets["tg"] = tg_vars
        fake_in = jax.lax.stop_gradient(to_imagenet_norm(fake))
        t_fake_in = jax.lax.stop_gradient(to_imagenet_norm(tfake))

        tpf, td_v, _ = apply_net(self.TD, nets["td"], t_fake_in)
        _, td_v, _ = apply_net(self.TD, td_v, real_in)
        nets["td"] = td_v
        t_disc = discrepancy(tpf, self.gan_mode)
        ema["d_arch"] = ema_update(ema["d_arch"], t_disc, ema_beta)
        target = jax.lax.stop_gradient(ema["d_arch"])

        def arch_loss(a):
            v = {**nets["d"], "arch": a}
            pf, v, _ = apply_net(self.D, v, fake_in)
            s_disc = discrepancy(pf, self.gan_mode)
            pr, v, _ = apply_net(self.D, v, real_in)
            l_fake = gan_loss(pf, False, self.gan_mode)
            l_real = gan_loss(pr, True, self.gan_mode)
            return jnp.abs(s_disc - target) + l_real + l_fake, (v, s_disc)

        (loss_arch, (d_vars, s_disc)), ga = jax.value_and_grad(
            arch_loss, has_aux=True)(alphas)
        new_alphas, opts["arch"] = adam_step(self.tx_arch, ga, opts["arch"],
                                             alphas, arch_lr)
        nets["d"] = {**d_vars, "arch": new_alphas}
        new_state = GANState(step=state.step, nets=nets, opts=opts, ema=ema,
                             rng=state.rng)
        return new_state, {"D_arch": loss_arch, "D_arch_diff": s_disc,
                           "teacher_D_arch_diff": ema["d_arch"]}

    # ------------------------------------------------------------------ eval

    def generate(self, state: GANState, lr_img: jax.Array,
                 teacher: bool = False) -> jax.Array:
        return self._generate(state, lr_img, teacher)

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _generate(self, state, lr_img, teacher=False):
        net, mod = (state.nets["tg"], self.TG) if teacher \
            else (state.nets["g"], self.G)
        out, _, _ = apply_net(mod, net, lr_img, train=False,
                              update_stats=False)
        return out

    # ------------------------------------------------------------- checkpoint

    def checkpoint_payload(self, state, epoch, metric=None) -> dict:
        return {"G": state.nets["g"], "D": state.nets["d"], "epoch": epoch,
                "cfg": (self.filter_cfgs, self.channel_cfgs), "psnr": metric}

    def load_net_params(self, state, ckpt, load_discriminator=True):
        nets = dict(state.nets)
        nets["g"] = ckpt["G"]
        if load_discriminator and ckpt.get("D") is not None:
            nets["d"] = ckpt["D"]
        return state.replace(nets=nets)


def lottery_transplant(pruned_params: dict, full_params: dict,
                       filter_cfgs, scores) -> dict:
    """Lottery-ticket warm start: copy kept-channel weights from the sparse
    full-width checkpoint into the pruned student (the reference calls
    `lottery_theory` at SRGAN.py:795-796 but never defines it — this is the
    fix). scores = per-block channel scores used by the prune (prune.py)."""
    import numpy as _np
    out = jax.tree_util.tree_map(lambda x: x, pruned_params)  # copy structure

    def order(s, k):
        return _np.argsort(-_np.asarray(s))[:k]

    for name, sub in full_params.items():
        if name not in out:
            continue
        if name.startswith("block_") and name.endswith("_conv1"):
            b = int(name.split("_")[1])
            keep = order(scores[b], _np.asarray(out[name]["kernel"]).shape[-1])
            out[name] = {"kernel": jnp.asarray(
                _np.asarray(sub["kernel"])[..., keep]),
                "bias": jnp.asarray(_np.asarray(sub["bias"])[keep])}
        elif name.startswith("block_") and name.endswith("_conv2"):
            b = int(name.split("_")[1])
            keep = order(scores[b],
                         _np.asarray(out[name]["kernel"]).shape[-2])
            out[name] = {"kernel": jnp.asarray(
                _np.asarray(sub["kernel"])[:, :, keep, :]),
                "bias": jnp.asarray(_np.asarray(sub["bias"]))}
        elif name.startswith("block_") and "_bn1" in name:
            b = int(name.split("_")[1])
            keep = order(scores[b], _np.asarray(out[name]["scale"]).shape[0])
            out[name] = {k: jnp.asarray(_np.asarray(v)[keep])
                         for k, v in sub.items()}
        else:
            out[name] = jax.tree_util.tree_map(jnp.asarray, sub)
    return out
