"""HBM-resident dataset cache (data/device_cache.py).

The DeviceCacheLoader must yield the SAME pixel stream as the host
streaming path: identical rng draws (PackedDataset.sample_params) and
normalize math within 1 ulp of the host float32 formula (device uses
x/255*2-1, which XLA lowers with a reciprocal multiply). Runs on the
8-virtual-CPU-device mesh from conftest.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from gcc_tpu.config import Config
from gcc_tpu.data import create_split_dataset
from gcc_tpu.data.device_cache import DeviceCacheLoader
from gcc_tpu.data.loader import Loader
from gcc_tpu.data.packed import PackedDataset, pack_dataset

TOL = 1.3e-7  # 1 ulp at |x| <= 1


def _imgs(d, n, w, h, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img_{i:03d}.png"))


def _host_stream(cfg, seed, n_batches, **loader_kw):
    """Streaming-path batches with a pinned order (1 thread, no prefetch)."""
    ds = PackedDataset(cfg, seed=seed, out_dtype="float32")
    it = iter(Loader(ds, cfg.batch_size, num_threads=1, prefetch=1,
                     seed=seed, **loader_kw))
    return [next(it) for _ in range(n_batches)]


def _device_stream(cfg, seed, n_batches, mesh=None, **loader_kw):
    ds = PackedDataset(cfg, seed=seed, out_dtype="uint8")
    dl = DeviceCacheLoader(ds, cfg.batch_size, dtype=jnp.float32, mesh=mesh,
                           seed=seed, **loader_kw)
    it = iter(dl)
    return [next(it) for _ in range(n_batches)]


def _assert_batches_eq(host, dev):
    for hb, db in zip(host, dev):
        assert sorted(hb) == sorted(db)
        for k in hb:
            if isinstance(hb[k], np.ndarray) and hb[k].dtype != np.uint8:
                np.testing.assert_allclose(np.asarray(db[k]), hb[k],
                                           atol=TOL, rtol=0, err_msg=k)
            elif isinstance(hb[k], list):
                assert hb[k] == db[k], k


def test_aligned_device_stream_parity(tmp_path):
    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 16, 48, 24)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=24, crop_size=16, batch_size=4, no_flip=False,
                 preprocess="resize_and_crop", max_dataset_size=float("inf"),
                 serial_batches=False)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    assert PackedDataset(cfg).device_cacheable()
    host = _host_stream(cfg, 0, 4, shuffle=True)
    dev = _device_stream(cfg, 0, 4, shuffle=True)
    _assert_batches_eq(host, dev)
    # crop/flip actually varied across the stream
    assert not np.allclose(np.asarray(dev[0]["A"]), np.asarray(dev[1]["A"]))


def test_aligned_device_stream_on_mesh(tmp_path):
    from gcc_tpu.parallel import make_mesh
    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 8, 48, 24)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=24, crop_size=16, batch_size=8, no_flip=False,
                 preprocess="resize_and_crop", max_dataset_size=float("inf"),
                 serial_batches=True)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    mesh = make_mesh(4)
    host = _host_stream(cfg, 0, 1, shuffle=False)
    dev = _device_stream(cfg, 0, 1, mesh=mesh, shuffle=False)
    _assert_batches_eq(host, dev)
    # batches come out sharded over the data axis
    shd = dev[0]["A"].sharding
    assert getattr(shd, "spec", None) is not None
    assert shd.spec[0] == "data"


@pytest.mark.parametrize("serial", [False, True])
def test_unaligned_device_stream_parity(tmp_path, serial):
    root = str(tmp_path / "uab")
    _imgs(os.path.join(root, "trainA"), 7, 30, 26, seed=1)
    _imgs(os.path.join(root, "trainB"), 5, 30, 26, seed=2)
    cfg = Config(dataroot=root, phase="train", dataset_mode="unaligned",
                 load_size=24, crop_size=16, batch_size=3, no_flip=False,
                 preprocess="resize_and_crop", max_dataset_size=float("inf"),
                 serial_batches=serial, split_dataset=False)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    assert PackedDataset(cfg).device_cacheable()
    host = _host_stream(cfg, 3, 3, shuffle=not serial)
    dev = _device_stream(cfg, 3, 3, shuffle=not serial)
    _assert_batches_eq(host, dev)


def test_sa_device_stream_parity(tmp_path):
    root = str(tmp_path / "sa")
    _imgs(os.path.join(root, "train"), 6, 20, 20, seed=3)
    cfg = Config(dataroot=root, phase="train", dataset_mode="sa",
                 crop_size=16, batch_size=3, z_dim=8, center_crop=False,
                 max_dataset_size=float("inf"), serial_batches=True)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    assert PackedDataset(cfg).device_cacheable()
    host = _host_stream(cfg, 1, 2, shuffle=False)
    dev = _device_stream(cfg, 1, 2, shuffle=False)
    _assert_batches_eq(host, dev)


def test_sr_not_cacheable(tmp_path):
    root = str(tmp_path / "sr")
    # variable source sizes -> no uniform shape -> streaming fallback
    d = os.path.join(root, "train")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    for i, (w, h) in enumerate([(40, 32), (36, 44)]):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            os.path.join(d, f"i{i}.png"))
    cfg = Config(dataroot=root, phase="train", dataset_mode="sr",
                 image_size=24, upscale_factor=4, batch_size=1,
                 max_dataset_size=float("inf"), serial_batches=True)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    assert not PackedDataset(cfg).device_cacheable()
    with pytest.raises(ValueError):
        DeviceCacheLoader(PackedDataset(cfg, out_dtype="uint8"), 1)


def test_create_split_dataset_device_cache_on(tmp_path):
    """--device_cache on routes the split loaders through the cache; the
    default auto mode keeps streaming on CPU."""
    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 6, 48, 24)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=24, crop_size=16, batch_size=2, no_flip=False,
                 preprocess="resize_and_crop", max_dataset_size=float("inf"),
                 serial_batches=False, device_cache="on", num_threads=1)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)
    tr, va = create_split_dataset(cfg, seed=0)
    assert isinstance(tr, DeviceCacheLoader)
    assert isinstance(va, DeviceCacheLoader)
    # the two loaders share one HBM copy of each blob
    assert tr._data["A"] is va._data["A"]
    b = next(iter(tr))
    assert isinstance(b["A"], jax.Array) and b["A"].shape == (2, 16, 16, 3)
    # auto on CPU: streaming
    tr2, _ = create_split_dataset(cfg.replace(device_cache="auto"), seed=0)
    assert isinstance(tr2, Loader) and not isinstance(tr2, DeviceCacheLoader)


def test_epoch_keyed_shuffle_matches_host(tmp_path):
    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 9, 48, 24)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=24, crop_size=16, batch_size=3, no_flip=True,
                 preprocess="resize_and_crop", max_dataset_size=float("inf"),
                 serial_batches=False)
    packed = pack_dataset(cfg, num_threads=1)
    cfg = cfg.replace(dataroot=packed)

    ds_h = PackedDataset(cfg, seed=5, out_dtype="float32")
    lh = Loader(ds_h, 3, num_threads=1, prefetch=1, seed=5, shuffle=True)
    ds_d = PackedDataset(cfg, seed=5, out_dtype="uint8")
    ld = DeviceCacheLoader(ds_d, 3, dtype=jnp.float32, seed=5, shuffle=True)
    for ep in (2, 7):
        lh.set_epoch(ep)
        ld.set_epoch(ep)
        _assert_batches_eq(list(lh), list(ld))


def _tiny_engine():
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 num_downs=5, crop_size=32, load_size=32, batch_size=2,
                 lambda_L1=100.0, gan_mode="hinge", online_distillation=True,
                 darts_discriminator=True, lambda_content=50.0,
                 lambda_gram=1e4, lr=2e-4, arch_lr=1e-4)
    return Pix2PixEngine(cfg)


def test_fused_step_matches_unfused(tmp_path):
    """FusedCachedStep (materialize traced into the cooperative step, one
    dispatch per iteration) must produce the same training trajectory as
    the unfused device-cache path (materialize dispatch -> step dispatch):
    same loader rng stream, same pixels, same engine math."""
    from gcc_tpu.data.device_cache import FusedCachedStep, InfiniteParams

    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 8, 94, 32)
    dcfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                  load_size=32, crop_size=32, batch_size=2, no_flip=False,
                  preprocess="resize_and_crop",
                  max_dataset_size=float("inf"), serial_batches=False)
    packed = pack_dataset(dcfg, num_threads=1)
    dcfg = dcfg.replace(dataroot=packed)

    engine = _tiny_engine()
    state0 = engine.init_state(jax.random.PRNGKey(0), image_size=32)

    def loaders():
        return (DeviceCacheLoader(PackedDataset(dcfg, seed=0,
                                                out_dtype="uint8"), 2,
                                  dtype=jnp.float32, seed=0),
                DeviceCacheLoader(PackedDataset(dcfg, seed=1,
                                                out_dtype="uint8"), 2,
                                  dtype=jnp.float32, seed=1))

    # unfused: materializer dispatch per batch, then the combined step
    tl, vl = loaders()
    vstream = iter(vl)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    ref_losses = []
    for i, b in enumerate(iter(tl)):
        if i == 3:
            break
        batch = {k: v for k, v in b.items() if not k.endswith("_paths")}
        vb = next(vstream)
        val = {k: v for k, v in vb.items() if not k.endswith("_paths")}
        state, m = engine.train_arch_step(state, batch, val, 2e-4, 0.9, 1e-4)
        ref_losses.append({k: float(v) for k, v in m.items()})
    ref_state = state

    # fused: one program per iteration from the packed param matrices
    tl2, vl2 = loaders()
    fused = FusedCachedStep(engine, tl2, vl2)
    vparams = InfiniteParams(vl2)
    state = jax.tree_util.tree_map(jnp.copy, state0)
    for i, (targs, paths) in enumerate(tl2.iter_param_batches()):
        if i == 3:
            break
        assert set(paths) == {"A_paths", "B_paths"}
        vargs, _ = next(vparams)
        state, m = fused.train_arch_step(state, targs, vargs,
                                         2e-4, 0.9, 1e-4)
        for k, v in m.items():
            np.testing.assert_allclose(float(v), ref_losses[i][k],
                                       rtol=2e-5, atol=1e-6, err_msg=k)

    for rp, fp in zip(jax.tree_util.tree_leaves(ref_state.nets),
                      jax.tree_util.tree_leaves(state.nets)):
        np.testing.assert_allclose(np.asarray(fp), np.asarray(rp),
                                   rtol=2e-5, atol=1e-6)


def test_fused_train_only_swap_ab(tmp_path):
    """Non-darts fused path + --direction BtoA: the in-program swap must
    match set_input's host-side swap (cli/train.py:set_input)."""
    from gcc_tpu.data.device_cache import FusedCachedStep

    root = str(tmp_path / "ab")
    _imgs(os.path.join(root, "train"), 4, 94, 32)
    dcfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                  load_size=32, crop_size=32, batch_size=2, no_flip=True,
                  preprocess="resize_and_crop",
                  max_dataset_size=float("inf"), serial_batches=True)
    packed = pack_dataset(dcfg, num_threads=1)
    dcfg = dcfg.replace(dataroot=packed)

    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, num_downs=5, crop_size=32,
                 batch_size=2, lambda_L1=100.0, gan_mode="hinge", lr=2e-4)
    engine = Pix2PixEngine(cfg)
    state0 = engine.init_state(jax.random.PRNGKey(1), image_size=32)

    tl = DeviceCacheLoader(PackedDataset(dcfg, seed=0, out_dtype="uint8"),
                           2, dtype=jnp.float32, seed=0, shuffle=False)
    b = next(iter(tl))
    swapped = {"A": b["B"], "B": b["A"]}
    state = jax.tree_util.tree_map(jnp.copy, state0)
    state, m_ref = engine.train_step(state, swapped, 2e-4)

    tl2 = DeviceCacheLoader(PackedDataset(dcfg, seed=0, out_dtype="uint8"),
                            2, dtype=jnp.float32, seed=0, shuffle=False)
    fused = FusedCachedStep(engine, tl2, swap_ab=True)
    targs, _ = next(tl2.iter_param_batches())
    state2 = jax.tree_util.tree_map(jnp.copy, state0)
    state2, m = fused.train_step(state2, targs, 2e-4)
    for k in m_ref:
        np.testing.assert_allclose(float(m[k]), float(m_ref[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_cli_train_with_device_cache(tmp_path):
    """cli.train end-to-end with --device_cache on: loaders come from the
    HBM-resident path (forced on CPU), batches reach the engine as device
    arrays through set_input, training + eval + checkpointing all work."""
    from gcc_tpu.cli.train import main as train_main
    root = str(tmp_path / "src")
    _imgs(os.path.join(root, "train"), 8, 64, 32)
    _imgs(os.path.join(root, "val"), 2, 64, 32)
    cfg = Config(dataroot=root, phase="train", dataset_mode="aligned",
                 load_size=32, crop_size=32, no_flip=True,
                 preprocess="resize_and_crop")
    packed = pack_dataset(cfg, num_threads=1)
    pack_dataset(cfg.replace(phase="val", load_size=256), num_threads=1)
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot {packed} --dataset_mode aligned --model pix2pix "
            f"--ngf 4 --ndf 4 --teacher_ngf 8 --teacher_ndf 8 "
            f"--num_downs 5 --crop_size 32 --load_size 32 --batch_size 4 "
            f"--n_epochs 1 --n_epochs_decay 0 --print_freq 100 "
            f"--online_distillation --darts_discriminator "
            f"--lambda_content 50 --lambda_gram 1e4 --name dc "
            f"--checkpoints_dir {exp} --save_epoch_freq 1 --ntest 2 "
            f"--device_cache on").split()
    assert train_main(args) == 0
    with open(os.path.join(exp, "dc", "logger.log")) as f:
        log = f.read()
    assert "device_cache:" in log and "resident in device memory" in log
    assert os.path.exists(os.path.join(exp, "dc", "checkpoints",
                                       "model_best_AtoB.ckpt"))
