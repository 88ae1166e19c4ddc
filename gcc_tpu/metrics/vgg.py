"""Truncated VGG19 feature extractor (models/GANLoss.py:95-144).

TruncatedVGG19(i=5, j=4): output = ReLU(conv5_4), i.e. torchvision
``vgg19.features[:36]``. Used as SRGAN's perceptual space (SRGAN.py:451-453)
on imagenet-normalized inputs.

Weights: the environment has no torchvision/downloads; `load_torch_vgg19`
ports a locally provided torchvision state_dict (.pth via torch, or .npz).
Without weights the module runs with its init (useful for tests; a warning
is the caller's job). Conv names mirror torchvision feature indices so the
port is mechanical: conv_0, conv_2, conv_5, ...
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from gcc_tpu.ops.layers import Conv

# torchvision vgg19.features conv layer indices (configuration E)
VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_POOL_AFTER = {2, 7, 16, 25}  # maxpool follows the conv at these indices


class TruncatedVGG19(nn.Module):
    """VGG19 features through ReLU(conv5_4); NHWC, imagenet-norm input."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        for idx in VGG19_CONV_IDX:
            ch = 64 * min(2 ** sum(1 for p in _POOL_AFTER if p < idx), 8)
            h = Conv(ch, (3, 3), (1, 1), 1, name=f"conv_{idx}")(h)
            h = jax.nn.relu(h)
            if idx in _POOL_AFTER:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return h


def load_torch_vgg19(path) -> dict:
    """Port a torchvision vgg19 state_dict (.pth, an .npz of it, or an
    in-memory {key: ndarray} mapping) to this module's param tree."""
    if isinstance(path, dict):
        sd = path
    elif path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu").items()}
    params = {}
    for idx in VGG19_CONV_IDX:
        w = sd[f"features.{idx}.weight"]  # (O, I, H, W)
        b = sd[f"features.{idx}.bias"]
        params[f"conv_{idx}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(b),
        }
    return params


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def to_imagenet_norm(x_m11: jax.Array) -> jax.Array:
    """[-1,1] NHWC -> imagenet-normalized (data/sr_dataset.py:52-56)."""
    x01 = (x_m11 + 1.0) / 2.0
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD
