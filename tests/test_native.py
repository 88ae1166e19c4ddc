"""Native C++ image engine: PIL parity + pipeline wiring."""

import numpy as np
import pytest
from PIL import Image

from gcc_tpu import native
from gcc_tpu.config import Config
from gcc_tpu.data.transforms import apply_transform, get_params

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_resize_matches_pil():
    rng = np.random.RandomState(0)
    img = (rng.rand(120, 90, 3) * 255).astype(np.uint8)
    for oh, ow in [(256, 256), (64, 48), (286, 286)]:
        ours = native.resize_bicubic(img, oh, ow)
        pil = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BICUBIC))
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_transform_batch_matches_python_path():
    rng = np.random.RandomState(1)
    raw = (rng.rand(300, 200, 3) * 255).astype(np.uint8)
    img = Image.fromarray(raw)
    cfg = Config(preprocess="resize_and_crop", load_size=64, crop_size=48,
                 no_flip=False)
    params = {"crop_pos": (5, 9), "flip": True}
    py = apply_transform(cfg, img, params)
    nat = native.transform_batch([raw], 64, 48, [(5, 9)], [True])[0]
    assert nat.shape == py.shape == (48, 48, 3)
    assert np.abs(nat - py).max() <= 1.01 * 2 / 255  # one uint8 level

    cfg_nat = Config(preprocess="resize_and_crop", load_size=64, crop_size=48,
                     no_flip=False, native_loader=True)
    via_cfg = apply_transform(cfg_nat, img, params)
    np.testing.assert_array_equal(via_cfg, nat)


def test_transform_batch_threads_consistent():
    rng = np.random.RandomState(2)
    imgs = [(rng.rand(100, 100, 3) * 255).astype(np.uint8) for _ in range(8)]
    a = native.transform_batch(imgs, 64, 64, [(0, 0)] * 8, [False] * 8,
                               num_threads=1)
    b = native.transform_batch(imgs, 64, 64, [(0, 0)] * 8, [False] * 8,
                               num_threads=8)
    np.testing.assert_array_equal(a, b)
