"""Shared engine machinery: functional net application, Adam with external
LR, sparsity gradient injection, distillation helpers, EMA discrepancy.

The reference mutates module state (requires_grad flips, forward hooks,
in-place grad injection — models/Pix2Pix.py:554-634). Here every train step
is a pure function: parameter partitions replace requires_grad, sown
intermediates replace hooks, and gradient transforms replace .grad mutation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gcc_tpu.losses import gan_loss, gram, gram_pair_err, mse, sqrt_mse


@struct.dataclass
class GANState:
    """One engine's full training state (student + optional online teacher).

    Pytree-of-arrays; fields unused by a configuration are None. `nets` maps
    name -> {'params':..., <collection>:...}; `opts` maps name -> optax state;
    `ema` holds teacher-discrepancy EMA scalars (models/Pix2Pix.py:503-510).
    """

    step: jnp.ndarray
    nets: Dict[str, Any]
    opts: Dict[str, Any]
    ema: Dict[str, jnp.ndarray]
    rng: jax.Array


def apply_net(module, variables: Dict[str, Any], *args,
              train: bool = True, capture: bool = False,
              rngs=None, update_stats: bool = True):
    """Functionally apply a Flax module.

    variables: {'params':..., 'batch_stats':..., 'spectral':..., 'arch':...}
    Returns (out, new_variables, feats) where feats is the ordered list of
    sown intermediates (g_feat_*/d_feat_*) and new_variables carries updated
    mutable collections (batch_stats / spectral) when train & update_stats.
    """
    mutable = []
    if train and update_stats:
        mutable += [c for c in ("batch_stats", "spectral") if c in variables]
    if capture:
        mutable.append("intermediates")
    if mutable:
        out, mut = module.apply(variables, *args, train=train,
                                mutable=mutable, rngs=rngs)
    else:
        out = module.apply(variables, *args, train=train, rngs=rngs)
        mut = {}
    new_vars = dict(variables)
    for k, v in mut.items():
        if k != "intermediates":
            new_vars[k] = v
    feats = []
    if capture and "intermediates" in mut:
        inter = mut["intermediates"]
        for key in sorted(inter.keys()):
            feats.append(inter[key][0])
    return out, new_vars, feats


def d_pair(module, variables: Dict[str, Any], x_a, x_b,
           fused: bool = False, update_stats: bool = True,
           capture_b: bool = False):
    """Discriminator forwards on an update's (real, fake) input pair.

    Default (fused=False): the reference's two sequential train-mode
    forwards (models/Pix2Pix.py:464-477) — per-half BatchNorm batches, one
    spectral power iteration per forward. Under the data-parallel mesh the
    backward of EACH half contracts the sharded batch dim in its own dot,
    so XLA all-reduces every D weight gradient TWICE per update.

    fused=True (--fused_d_batch): ONE forward over the pair stacked on a
    new axis 1 and flattened into the batch dim. The flatten keeps shard
    boundaries device-local (global row 2b+j lives where row b lived), so
    SPMD inserts zero resharding collectives, and the single batch
    contraction per weight cuts the cross-chip gradient traffic for D
    updates in half — all-reduce bytes drop from 1.256x to ~1.0x parameter
    bytes on the 8-mesh (benchmarks/mesh_overhead.py). Deviation (see
    PARITY.md): batch-coupled state sees the mixed 2B batch — BatchNorm
    statistics (pix2pix/srgan D) and one spectral power iteration instead
    of two (sagan D); instance-norm D's (cyclegan) are numerically
    unchanged. Per-sample outputs/gradients are otherwise identical.

    Returns (p_a, p_b, new_variables[, feats_b if capture_b]) matching the
    two-forward call-site contract; feats_b are the sown intermediates of
    the x_b forward (fused mode slices each captured feature back to its
    x_b half).
    """
    if not fused:
        p_a, v, _ = apply_net(module, variables, x_a,
                              update_stats=update_stats)
        p_b, v, feats = apply_net(module, v, x_b, capture=capture_b,
                                  update_stats=update_stats)
        return (p_a, p_b, v, feats) if capture_b else (p_a, p_b, v)
    n = x_a.shape[0]
    both = jnp.stack([x_a, x_b], axis=1).reshape((2 * n,) + x_a.shape[1:])
    p, v, feats = apply_net(module, variables, both, capture=capture_b,
                            update_stats=update_stats)
    p = p.reshape((n, 2) + p.shape[1:])
    if capture_b:
        feats = [f.reshape((n, 2) + f.shape[1:])[:, 1] for f in feats]
        return p[:, 0], p[:, 1], v, feats
    return p[:, 0], p[:, 1], v


# ---------------------------------------------------------------------------
# Optimization
# ---------------------------------------------------------------------------

def make_adam(b1: float = 0.9, b2: float = 0.999):
    """Adam direction (torch-equivalent); LR applied externally per step so
    epoch schedules need no optimizer rebuild (utils/util.py:288-303)."""
    return optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8)


def adam_step(tx, grads, opt_state, params, lr):
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u.astype(p.dtype), params, updates)
    return params, opt_state


def dup_path_mask(params, pred):
    """Boolean pytree (static python bools): True where pred(path_str).

    Marks parameters the reference's ``named_modules()`` optimizer scans add
    TWICE to one param group (a module and its submodule both match the
    isinstance filter, e.g. SpectralNorm wrapper + inner conv,
    models/SAGAN.py:315-346)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: pred(_path_str(path)), params)


def dup_adam_step(tx_single, tx_dup, grads, opt_state, params, lr, dup_mask):
    """Adam step replicating torch's duplicate-param-group behavior.

    torch.optim.Adam applies one update PER OCCURRENCE of a param in the
    group, sharing moment/step state — a twice-added param gets two
    sequential applications of the same gradient per step (moments decayed
    twice, step count +2, verified empirically against torch 2.13). The
    reference's SAGAN scans (models/SAGAN.py:315-327, 339-346) double-add
    every SpectralNorm-wrapped conv and every attention q/k/v conv of the
    STUDENT G (distill branch) and masked D, so those weights effectively
    train at ~2x the step size of BatchNorm/gamma/head params.

    opt_state is a (single_state, dup_state) pair over the full tree;
    single_state advances once per step and is applied only where
    dup_mask is False, dup_state advances twice and is applied twice where
    dup_mask is True. dup_mask leaves are static bools, so the select
    resolves at trace time.
    """
    s_st, d_st = opt_state
    u, s_st = tx_single.update(grads, s_st, params)
    params = jax.tree_util.tree_map(
        lambda p, u_, m: p if m else p - lr * u_.astype(p.dtype),
        params, u, dup_mask)
    for _ in range(2):
        u, d_st = tx_dup.update(grads, d_st, params)
        params = jax.tree_util.tree_map(
            lambda p, u_, m: p - lr * u_.astype(p.dtype) if m else p,
            params, u, dup_mask)
    return params, (s_st, d_st)


# ---------------------------------------------------------------------------
# L1 sparsity gradient injection (models/Pix2Pix.py:554-563)
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def add_sign_sparsity(grads, params, lambda_weight: float,
                      lambda_scale: float, weight_scale_fn=None):
    """grad += lambda * sign(w) on conv kernels (lambda_weight) or norm scales
    (lambda_scale). weight_scale_fn(path_str) -> extra multiplier implements
    CycleGAN's heavy_sparsity weighting (CycleGAN.py:539-559)."""
    if lambda_weight <= 0.0 and lambda_scale <= 0.0:
        return grads

    def upd(path, g, p):
        name = _path_str(path)
        leaf = name.rsplit("/", 1)[-1]
        if lambda_weight > 0.0 and leaf == "kernel":
            lam = lambda_weight
            if weight_scale_fn is not None:
                lam = lam * weight_scale_fn(name)
            return g + lam * jnp.sign(p)
        if lambda_scale > 0.0 and leaf == "scale" and (
                "norm" in name or "bn" in name):
            return g + lambda_scale * jnp.sign(p)
        return g

    return jax.tree_util.tree_map_with_path(upd, grads, params)


def cyclegan_heavy_sparsity(name: str) -> float:
    """1000x on the first upsample deconv, 2x on stem/downs-ups listed in
    heavy_sparsity (CycleGAN.py:245, 544-559)."""
    if name.startswith("up_0/"):
        return 1000.0
    for prefix in ("conv_in/", "down_0/", "up_1/"):
        if name.startswith(prefix):
            return 2.0
    return 1.0


# ---------------------------------------------------------------------------
# Distillation (models/Pix2Pix.py:528-548)
# ---------------------------------------------------------------------------

def distill_losses(feats: List[jax.Array], targets: List[jax.Array],
                   use_sqrt: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Content + gram sums over paired features; targets stop-gradiented.
    pix2pix/sagan/srgan use sqrt(MSE); cyclegan plain MSE (CycleGAN.py:513)."""
    err = sqrt_mse if use_sqrt else mse
    content = jnp.float32(0.0)
    gram_l = jnp.float32(0.0)
    for f, t in zip(feats, targets):
        t = jax.lax.stop_gradient(t)
        content = content + err(f, t)
        gram_l = gram_l + gram_pair_err(f, t, use_sqrt)
    return content, gram_l


# ---------------------------------------------------------------------------
# Teacher discrepancy EMA (models/Pix2Pix.py:489-511)
# ---------------------------------------------------------------------------

def discrepancy(pred_fake: jax.Array, gan_mode: str) -> jax.Array:
    """|GANLoss(pred_fake, True, G-side) - GANLoss(pred_fake, False, D-side)|
    — how far D's judgment of fakes is from 'real'."""
    fake_real = gan_loss(pred_fake, True, gan_mode, for_discriminator=False)
    fake = gan_loss(pred_fake, False, gan_mode, for_discriminator=True)
    return jnp.abs(fake_real - fake)


def ema_update(prev: jax.Array, new: jax.Array, beta) -> jax.Array:
    """EMA with first-call bootstrap: prev==0 means uninitialized.

    Zero-as-uninitialized is the REFERENCE's own semantics — it branches on
    ``current_D_arch_diff_loss != 0.0`` (models/Pix2Pix.py:504-508), so a
    legitimately-zero EMA re-bootstraps there too. Preserved deliberately
    (measure-zero event; an init flag would change reference behavior)."""
    return jnp.where(prev == 0.0, new, beta * new + (1.0 - beta) * prev)


def metrics_mean(d: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {k: jnp.asarray(v, jnp.float32) for k, v in d.items()}


class CombinedStepMixin:
    """Fuse the cooperative train step and the darts arch step into ONE
    compiled program (the reference runs them back-to-back per iteration,
    train.py:144-151). Halves per-iteration dispatches and lets XLA schedule
    across the two phases. Engines provide _train_step and _arch_step."""

    @property
    def combined_jit(self):
        """The fused train+arch jitted step, built lazily (also the AOT
        surface: benchmarks lower() it for cost/memory analysis)."""
        if not hasattr(self, "_jit_combined"):
            def _combined(state, batch, val_batch, lr, ema_beta, arch_lr):
                state, m = self._train_step(state, batch, lr)
                state, am = self._arch_step(state, val_batch, ema_beta,
                                            arch_lr)
                return state, {**m, **am}
            self._jit_combined = jax.jit(_combined, donate_argnums=0)
        return self._jit_combined

    @property
    def train_jit(self):
        """The jitted callable train_step dispatches to (AOT surface for
        utils/memory_guard.py). Engines with alternate paths override."""
        return self._jit_train

    def train_arch_step(self, state, batch, val_batch, lr, ema_beta,
                        arch_lr=None):
        if arch_lr is None:
            arch_lr = self.cfg.arch_lr
        return self.combined_jit(state, batch, val_batch, jnp.float32(lr),
                                  jnp.float32(ema_beta),
                                  jnp.float32(arch_lr))

    def generate_spatial(self, state, x, n_spatial=None, mesh=None,
                         teacher: bool = False):
        """Eval forward with the image H axis sharded across devices.

        Spatial partitioning (gcc_tpu.parallel.spatial): serves images whose
        activation footprint exceeds one chip's HBM by splitting rows over
        the 'spatial' mesh axis; XLA SPMD inserts the conv halo exchanges.
        Shard count auto-reduces to the largest divisor of the image height
        (arbitrary eval sizes never crash). Image-input generators only
        (SAGAN's z input has no spatial axis — use generate()).
        CycleGANEngine overrides to pick a direction."""
        from gcc_tpu.parallel.spatial import spatial_apply
        mod, net = (self.TG, "tg") if teacher else (self.G, "g")
        mod = self._spatial_safe(mod, net)
        return spatial_apply(mod, state.nets[net], x, mesh=mesh,
                             n_spatial=n_spatial)

    def _spatial_safe(self, mod, net):
        """Pallas kernels can't be SPMD-partitioned over the sharded H
        axis — force the XLA block path under spatial partitioning. Cached
        clone so spatial_apply's id-keyed jit cache stays warm."""
        if getattr(mod, "use_fused_blocks", False) is False:
            return mod
        cache_attr = f"_spatial_mod_{net}"
        if not hasattr(self, cache_attr):
            setattr(self, cache_attr, mod.clone(use_fused_blocks=False))
        return getattr(self, cache_attr)


# ---------------------------------------------------------------------------
# Device-resident replay pool (utils/image_pool.py:23-54, TPU-native)
# ---------------------------------------------------------------------------

def pool_init(pool_size: int, image_shape, dtype=jnp.float32):
    """Replay-pool state: zero buffer + fill count. Lives in the train state
    so the whole step stays one compiled program (the reference's ImagePool
    is host-side python with data-dependent branching)."""
    return {"buffer": jnp.zeros((pool_size,) + tuple(image_shape), dtype),
            "count": jnp.int32(0)}


def pool_query(pool: Dict[str, jax.Array], images: jax.Array,
               rng: jax.Array):
    """Sequential semantics of ImagePool.query: fill until full; then with
    p=0.5 swap in the new image and return a historical one, else return the
    new image. Returns (new_pool, out_images)."""
    buf, cnt = pool["buffer"], pool["count"]
    p = buf.shape[0]
    if p == 0:
        return pool, images
    in_dtype = images.dtype
    images = images.astype(buf.dtype)  # buffer stores f32; cast at boundary

    def body(i, carry):
        buf, cnt, out, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        img = jax.lax.dynamic_index_in_dim(images, i, keepdims=False)

        def insert(buf, cnt):
            return (jax.lax.dynamic_update_index_in_dim(buf, img, cnt, 0),
                    cnt + 1, img)

        def maybe_swap(buf, cnt):
            swap = jax.random.uniform(k1) > 0.5
            idx = jax.random.randint(k2, (), 0, p)
            old = jax.lax.dynamic_index_in_dim(buf, idx, keepdims=False)
            new_buf = jax.lax.cond(
                swap,
                lambda: jax.lax.dynamic_update_index_in_dim(buf, img, idx, 0),
                lambda: buf)
            return new_buf, cnt, jnp.where(swap, old, img)

        buf, cnt, ret = jax.lax.cond(cnt < p, insert, maybe_swap, buf, cnt)
        out = jax.lax.dynamic_update_index_in_dim(out, ret, i, 0)
        return buf, cnt, out, key

    out0 = jnp.zeros_like(images)
    buf, cnt, out, _ = jax.lax.fori_loop(
        0, images.shape[0], body, (buf, cnt, out0, rng))
    return {"buffer": buf, "count": cnt}, out.astype(in_dtype)
