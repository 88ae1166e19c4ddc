"""Resume, best-model combining, galleries, weight plots."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcc_tpu.config import Config
from gcc_tpu.utils.checkpoint import (combine_best_models, load_state,
                                      save_checkpoint, save_state,
                                      load_checkpoint)

K = jax.random.PRNGKey(0)


def test_full_state_resume_roundtrip(tmp_path):
    """Full state (params + adam moments + ema + rng) survives a save/load."""
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, crop_size=32, num_downs=5,
                 lambda_L1=100.0, gan_mode="hinge")
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(K)
    rng = np.random.RandomState(0)
    batch = {"A": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
             "B": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)}
    state, _ = eng.train_step(state, batch, 2e-4)
    path = str(tmp_path / "train_state.ckpt")
    save_state(path, state)

    template = eng.init_state(K)
    restored = load_state(path, template)
    assert int(restored.step) == int(state.step) == 1
    a = jax.tree_util.tree_leaves(state.opts["g"])
    b = jax.tree_util.tree_leaves(restored.opts["g"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # restored state must continue training
    restored2, m = eng.train_step(restored, batch, 2e-4)
    assert int(restored2.step) == 2
    assert all(np.isfinite(float(v)) for v in m.values())


def test_checkpoint_truncated_and_version_mismatch(tmp_path):
    """VERDICT r3 #7: torn writes and future-schema files fail with an
    actionable CheckpointError, not a raw msgpack/unpickling error."""
    from flax import serialization
    from gcc_tpu.utils.checkpoint import (CheckpointError, SCHEMA_VERSION,
                                          _SCHEMA_KEY)
    path = str(tmp_path / "model_3.ckpt")
    save_checkpoint(path, {"G": {"w": np.zeros((4, 4), np.float32)},
                           "epoch": 3, "cfg": [[4], [8]], "fid": 1.0})
    # round-trip strips the internal schema marker and keeps the contract keys
    ckpt = load_checkpoint(path)
    assert _SCHEMA_KEY not in ckpt and ckpt["epoch"] == 3

    # truncated write (simulated torn save): actionable error
    raw = open(path, "rb").read()
    torn = str(tmp_path / "torn.ckpt")
    with open(torn, "wb") as f:
        f.write(raw[: len(raw) // 2])
    with pytest.raises(CheckpointError, match="corrupt or truncated"):
        load_checkpoint(torn)

    # empty file (crash between open and write of a non-atomic writer)
    empty = str(tmp_path / "empty.ckpt")
    open(empty, "wb").close()
    with pytest.raises(CheckpointError, match="empty"):
        load_checkpoint(empty)

    # schema from the future: refuse loudly instead of misreading
    future = str(tmp_path / "future.ckpt")
    with open(future, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {_SCHEMA_KEY: SCHEMA_VERSION + 1, "epoch": 9}))
    with pytest.raises(CheckpointError, match="schema version"):
        load_checkpoint(future)

    # missing file
    with pytest.raises(CheckpointError, match="not found"):
        load_checkpoint(str(tmp_path / "nope.ckpt"))

    # model ckpt passed where a full-state resume ckpt is expected
    with pytest.raises(CheckpointError, match="full-state resume"):
        load_state(path, template=None)

    # legacy (pre-versioning) checkpoints still load: version 0 implied
    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as f:
        f.write(serialization.msgpack_serialize({"epoch": 7}))
    assert load_checkpoint(legacy)["epoch"] == 7


def test_combine_best_models():
    a = {"G_A": 1, "G_B": 2, "D_A": 3, "D_B": 4, "epoch": 5}
    b = {"G_A": 10, "G_B": 20, "D_A": 30, "D_B": 40, "epoch": 6}
    c = combine_best_models(a, b)
    assert c["G_A"] == 1 and c["D_A"] == 3
    assert c["G_B"] == 20 and c["D_B"] == 40


def test_weight_distribution_plots(tmp_path):
    from gcc_tpu.utils.visual import plot_weight_distribution
    params = {"down_0": {"kernel": np.random.rand(4, 4, 3, 8)},
              "nested": {"conv": {"kernel": np.random.rand(3, 3, 8, 4)}}}
    files = plot_weight_distribution(params, str(tmp_path))
    assert len(files) == 2
    assert all(os.path.exists(f) for f in files)


def test_html_gallery(tmp_path):
    from gcc_tpu.utils.visual import HTMLGallery
    g = HTMLGallery(str(tmp_path / "web"), title="t")
    img = np.random.rand(8, 8, 3).astype(np.float32) * 2 - 1
    g.add_images({"real": img, "fake": img}, "sample0")
    path = g.save()
    html = open(path).read()
    assert "sample0_real.png" in html and "sample0_fake.png" in html
    assert os.path.exists(os.path.join(str(tmp_path / "web"), "images",
                                       "sample0_fake.png"))


def test_lottery_transplant_shapes():
    from gcc_tpu.engines.srgan import lottery_transplant
    from gcc_tpu.models.generators import SRResNet
    full = SRResNet(n_channels=8, n_blocks=2)
    pruned = SRResNet(n_channels=8, n_blocks=2, filter_cfgs=[4, 6])
    x = jnp.zeros((1, 8, 8, 3))
    fp = full.init(K, x)["params"]
    pp = pruned.init(K, x)["params"]
    scores = [np.arange(8)[::-1].astype(float), np.arange(8).astype(float)]
    out = lottery_transplant(pp, fp, [4, 6], scores)
    # conv1 of block 0 keeps the top-4 channels by score (0,1,2,3)
    np.testing.assert_array_equal(
        np.asarray(out["block_0_conv1"]["kernel"]),
        np.asarray(fp["block_0_conv1"]["kernel"])[..., :4])
    # conv2 input sliced to the same channels
    assert out["block_0_conv2"]["kernel"].shape[2] == 4
    # unpruned layers copied wholesale
    np.testing.assert_array_equal(np.asarray(out["conv_in"]["kernel"]),
                                  np.asarray(fp["conv_in"]["kernel"]))


def test_get_data_sr_technique(tmp_path):
    """SR download path (datasets/download_esrgan_dataset.sh parity):
    offline it must fail fast with the fetch URL in the message."""
    import socket
    import pytest as _pytest
    from gcc_tpu.utils.get_data import GetData

    gd = GetData(technique="sr", save_path=str(tmp_path))
    assert {"flickr2k", "coco_train2014", "coco_val2014",
            "sr_testsets"} <= set(gd.available())
    with _pytest.raises(ValueError):
        gd.get("not_a_dataset")
    old = socket.getdefaulttimeout()
    socket.setdefaulttimeout(3)
    try:
        with _pytest.raises(RuntimeError, match="Flickr2K.tar"):
            gd.get("flickr2k")
    finally:
        socket.setdefaulttimeout(old)


def test_locked_random_state_concurrent_draws():
    """Hammer the dataset RNG from many threads: every draw must be a valid
    sample (no garbled mersenne state) and the draw count must be exact."""
    import concurrent.futures as futures
    from gcc_tpu.data.rng import LockedRandomState

    rng = LockedRandomState(0)
    n_threads, per_thread = 8, 500

    def worker(_):
        ints = [rng.randint(0, 1000) for _ in range(per_thread)]
        floats = [float(rng.rand()) for _ in range(per_thread)]
        return ints, floats

    with futures.ThreadPoolExecutor(n_threads) as pool:
        results = list(pool.map(worker, range(n_threads)))
    assert all(0 <= v < 1000 for ints, _ in results for v in ints)
    assert all(0.0 <= v < 1.0 for _, floats in results for v in floats)
    assert sum(len(i) + len(f) for i, f in results) == n_threads * per_thread * 2
    assert 0 <= rng.randint(0, 10) < 10  # state still functional


def test_compile_cache_enable(tmp_path):
    """compile_cache.enable points JAX's persistent cache at the resolved
    dir ("auto" => <checkpoints_dir>/jax_compile_cache), compiled
    executables land there, and "" disables. Global config is restored."""
    from gcc_tpu.utils.compile_cache import enable

    cfg = Config(checkpoints_dir=str(tmp_path), compile_cache="auto")
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        path = enable(cfg)
        assert path == os.path.join(str(tmp_path), "jax_compile_cache")
        assert os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path
        # force even trivial compiles into the cache, then compile one
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        x = jnp.arange(64.0).reshape(8, 8)
        jax.jit(lambda a: a @ a.T + jnp.tanh(a))(x).block_until_ready()
        assert len(os.listdir(path)) >= 1, "no cache entry written"

        assert enable(Config(compile_cache="")) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
        try:  # repoint the singleton back at the conftest-wide cache dir
            from jax._src import compilation_cache
            compilation_cache.reset_cache()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# memory guard (utils/memory_guard.py, VERDICT r3 #8)
# ---------------------------------------------------------------------------

class _ListLogger:
    def __init__(self):
        self.infos, self.warnings = [], []

    def info(self, msg):
        self.infos.append(str(msg))

    def warning(self, msg):
        self.warnings.append(str(msg))


def _guard_fn():
    # batch-dependent temps dominate: big elementwise intermediate
    return jax.jit(lambda s, b, lr: (s + b.sum(), (b * b + b).mean() * lr))


def test_memory_guard_under_budget():
    from gcc_tpu.utils.memory_guard import check_step
    log = _ListLogger()
    b = jnp.zeros((8, 16, 16, 3))
    r = check_step(_guard_fn(), (jnp.zeros(()), b, jnp.float32(1e-3)),
                   batch_argnums=(1,), batch_size=8,
                   hbm_bytes=1 << 30, logger=log)
    assert r is not None and r["peak_bytes"] < r["hbm_bytes"]
    assert any("projected step peak" in m for m in log.infos)
    assert not log.warnings


def test_memory_guard_over_budget_suggests_batch():
    """Synthetic oversize config: tiny forced HBM -> warning + max batch."""
    from gcc_tpu.utils.memory_guard import check_step
    log = _ListLogger()
    b = jnp.zeros((64, 16, 16, 3))
    r = check_step(_guard_fn(), (jnp.zeros(()), b, jnp.float32(1e-3)),
                   batch_argnums=(1,), batch_size=64,
                   hbm_bytes=48 * 1024, logger=log)
    assert r["peak_bytes"] > r["hbm_bytes"]
    assert any("EXCEEDS" in m for m in log.warnings)
    # batch-dependent peak => a reliable fit with a real suggestion
    assert r["batch_dependent_share"] > 0.5
    assert 1 <= r["suggested_max_batch"] < 64


def test_memory_guard_strict_raises():
    from gcc_tpu.utils.memory_guard import MemoryGuardError, check_step
    b = jnp.zeros((8, 16, 16, 3))
    with pytest.raises(MemoryGuardError):
        check_step(_guard_fn(), (jnp.zeros(()), b, jnp.float32(1e-3)),
                   batch_argnums=(1,), batch_size=8, hbm_bytes=16,
                   logger=_ListLogger(), strict=True)


def test_memory_guard_batch_insensitive_no_nonsense():
    """ADVICE-r3 regression shape: near-zero slope must NOT produce a
    max-batch suggestion (the cyclegan 'batch 4579 at 13.9 GiB' bug)."""
    from gcc_tpu.utils.memory_guard import check_step
    log = _ListLogger()
    w = jnp.zeros((256, 256))

    # peak dominated by the batch-INDEPENDENT w @ w temp
    f = jax.jit(lambda w, b: (w @ w @ w).sum() + b.sum())
    r = check_step(f, (w, jnp.zeros((4, 8))), batch_argnums=(1,),
                   batch_size=4, hbm_bytes=1024, logger=log)
    assert r["peak_bytes"] > r["hbm_bytes"]
    assert "suggested_max_batch" not in r
    assert any("batch-independent" in m for m in log.warnings)


@pytest.mark.slow
def test_memory_guard_in_cli_train(tmp_path):
    """--memory_guard on: cli.train logs the projection before iterating."""
    from gcc_tpu.cli.train import main as train_main
    exp = str(tmp_path / "experiments")
    args = (f"--dataroot synthetic --dataset_mode synthetic --model srgan "
            f"--ngf 4 --ndf 4 --image_size 32 --batch_size 2 --n_epochs 1 "
            f"--n_epochs_decay 0 --generator_only --print_freq 100 "
            f"--name mg --checkpoints_dir {exp} --save_epoch_freq 1 "
            f"--ntest 2 --memory_guard on").split()
    assert train_main(args) == 0
    with open(os.path.join(exp, "mg", "logger.log")) as f:
        log = f.read()
    assert "memory guard: projected step peak" in log


def test_assert_finite_losses_names_offenders():
    """--check_numerics core: the abort message carries the NAMES of the
    non-finite losses (SURVEY.md §5 sanitizers row)."""
    import numpy as np
    import pytest
    from gcc_tpu.utils.numerics import assert_finite_losses

    ok = {"G_gan": np.float32(0.5), "D_real": np.float32(0.1)}
    assert assert_finite_losses(ok) is ok  # chains through unchanged

    bad = {"G_gan": np.float32("nan"), "D_real": np.float32(0.1),
           "distill": np.float32("inf")}
    with pytest.raises(FloatingPointError) as ei:
        assert_finite_losses(bad, epoch=3, iters=128)
    msg = str(ei.value)
    assert "G_gan" in msg and "distill" in msg and "D_real" not in msg
    assert "epoch 3" in msg and "iters 128" in msg

    # array-valued entries report a non-finite count
    arr = {"per_layer": np.array([1.0, np.nan, np.inf, 2.0])}
    with pytest.raises(FloatingPointError, match=r"2/4 non-finite"):
        assert_finite_losses(arr)
