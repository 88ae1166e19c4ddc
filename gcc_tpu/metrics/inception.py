"""FID InceptionV3 (pool3, 2048-d) in Flax — metric/inception.py:16-315.

Architecture is torchvision InceptionV3 with the TF-FID patches the
reference applies (metric/inception.py:166-315):
  * every in-block average pool uses count_include_pad=False
    (FIDInceptionA/C/E_1)
  * the LAST InceptionE block (Mixed_7c) uses MAX pooling in its pool branch
    (FIDInceptionE_2)
Convs are bias-free + BatchNorm(eps=1e-3) + ReLU (BasicConv2d).

Input protocol (metric/fid_score.py:147-216 + inception.py:129-163):
[-1,1] float images -> uint8 -> /255 -> bilinear resize to 299 (no corner
alignment) -> 2x-1 -> network -> global average pool -> 2048-d activations.

Weights: the special FID weights ship from a URL (inception.py:13) the
sandbox cannot reach; `load_torch_fid_inception` ports a locally provided
torch state_dict (.pth) or .npz. Flax module names equal the torch module
names, so the port is mechanical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.lecun_normal(),
                       (*self.kernel, x.shape[-1], self.out_ch))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), self.stride,
            ((self.padding[0], self.padding[0]),
             (self.padding[1], self.padding[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        y = (y - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(y)


def avg_pool_nocountpad(x, window=3, stride=1, pad=1):
    """avg_pool2d(count_include_pad=False): divide by real window size."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return summed / counts


def max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_nocountpad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], -1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], -1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FIDInceptionE_2 (Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], -1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], -1)
        if self.use_max_pool:
            bp = max_pool(x, 3, 1, pad=1)
        else:
            bp = avg_pool_nocountpad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], -1)


class FIDInceptionV3(nn.Module):
    """pool3 (2048-d) feature extractor; input [0,1] NHWC at any size."""

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            # torch F.interpolate(bilinear, align_corners=False) == jax
            # 'linear' resize without antialiasing (inception.py:160-162)
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 "bilinear", antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> 2048


def load_torch_fid_inception(path) -> dict:
    """Port the pt_inception state_dict (an .npz of it, or an in-memory
    {key: ndarray} mapping) to Flax params."""
    if isinstance(path, dict):
        sd = path
    elif path.endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch
        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu").items()}

    params: dict = {}

    def put(flax_path, torch_prefix):
        node = params
        for p in flax_path[:-1]:
            node = node.setdefault(p, {})
        node[flax_path[-1]] = {
            "weight": jnp.asarray(np.transpose(
                sd[f"{torch_prefix}.conv.weight"], (2, 3, 1, 0))),
            "bn_scale": jnp.asarray(sd[f"{torch_prefix}.bn.weight"]),
            "bn_bias": jnp.asarray(sd[f"{torch_prefix}.bn.bias"]),
            "bn_mean": jnp.asarray(sd[f"{torch_prefix}.bn.running_mean"]),
            "bn_var": jnp.asarray(sd[f"{torch_prefix}.bn.running_var"]),
        }

    for stem in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"):
        put((stem,), stem)
    branches = {
        "Mixed_5b": ["branch1x1", "branch5x5_1", "branch5x5_2",
                     "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3",
                     "branch_pool"],
        "Mixed_6a": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                     "branch3x3dbl_3"],
        "Mixed_6b": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                     "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                     "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
        "Mixed_7a": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                     "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
        "Mixed_7b": ["branch1x1", "branch3x3_1", "branch3x3_2a",
                     "branch3x3_2b", "branch3x3dbl_1", "branch3x3dbl_2",
                     "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"],
    }
    branches["Mixed_5c"] = branches["Mixed_5d"] = branches["Mixed_5b"]
    branches["Mixed_6c"] = branches["Mixed_6d"] = branches["Mixed_6e"] = \
        branches["Mixed_6b"]
    branches["Mixed_7c"] = branches["Mixed_7b"]
    for block in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                  "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                  "Mixed_7c"):
        for br in branches[block]:
            put((block, br), f"{block}.{br}")
    return params


class InceptionExtractor:
    """Batched pool3 activations from [-1,1] images (fid_score.py:147-216).

    The uint8 round-trip (tensor2imgs) is reproduced so quantization matches
    the reference bit-for-bit.
    """

    _cache: dict = {}

    def __init__(self, params: dict, batch_size: int = 50):
        self.model = FIDInceptionV3()
        self.params = params
        self.batch_size = batch_size
        self._fn = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def get(cls, path: str) -> "InceptionExtractor":
        if path not in cls._cache:
            cls._cache[path] = cls(load_torch_fid_inception(path))
        return cls._cache[path]

    def activations(self, images_m11: np.ndarray) -> np.ndarray:
        imgs = np.asarray(images_m11, np.float32)
        u8 = np.clip((imgs + 1) / 2 * 255.0, 0, 255).astype(np.uint8)
        x = u8.astype(np.float32) / 255.0
        out = []
        for i in range(0, len(x), self.batch_size):
            out.append(np.asarray(
                self._fn(self.params, jnp.asarray(x[i:i + self.batch_size]))))
        return np.concatenate(out)
