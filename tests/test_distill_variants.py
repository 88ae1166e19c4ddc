"""normal_distillation (frozen teacher) + pix2pix-resnet union prune."""

import jax
import jax.numpy as jnp
import numpy as np

from gcc_tpu.config import Config

R = np.random.RandomState(0)
K = jax.random.PRNGKey(0)


def test_normal_distillation_teacher_frozen():
    from gcc_tpu.engines.pix2pix import Pix2PixEngine
    cfg = Config(model="pix2pix", ngf=4, ndf=4, teacher_ngf=8, teacher_ndf=8,
                 crop_size=32, num_downs=5, lambda_L1=100.0, gan_mode="hinge",
                 normal_distillation=True, lambda_content=50.0,
                 lambda_gram=1e4)
    eng = Pix2PixEngine(cfg)
    state = eng.init_state(K)
    t0 = np.asarray(jax.tree_util.tree_leaves(
        state.nets["tg"]["params"])[0]).copy()
    b = {"A": jnp.asarray(R.rand(2, 32, 32, 3), jnp.float32),
         "B": jnp.asarray(R.rand(2, 32, 32, 3), jnp.float32)}
    state, m = eng.train_step(state, b, 2e-4)
    t1 = np.asarray(jax.tree_util.tree_leaves(state.nets["tg"]["params"])[0])
    np.testing.assert_array_equal(t0, t1)  # frozen teacher
    assert "content" in m and np.isfinite(float(m["content"]))
    assert "tg" not in state.opts  # no teacher optimizer state allocated?


def test_pix2pix_resnet_union_prune():
    from gcc_tpu.models.generators import MobileResnetGenerator
    from gcc_tpu.compress.prune import (mobile_resnet_cfgs_union,
                                        prune_mobile_resnet_union)
    g = MobileResnetGenerator(ngf=32)
    shapes = jax.eval_shape(
        lambda k: g.init(k, jnp.zeros((1, 256, 256, 3))), K)["params"]
    params = jax.tree_util.tree_map(
        lambda s: (R.rand(*s.shape)
                   * np.exp(R.uniform(-6, 2, s.shape[-1]))).astype(np.float32),
        shapes)
    cfg, gm = prune_mobile_resnet_union(params, target_budget_g=3.0,
                                        tolerance_g=0.1)
    assert abs(gm - 3.0) <= 0.1
    assert len(cfg) == 23
    assert all(cfg[4 + 2 * b] == cfg[2] for b in range(9))  # tied residual


def test_union_vs_mean_residual_semantics():
    """Union keeps a channel if ANY member clears threshold; mean may not."""
    layers = {"conv_in": np.ones(4) * 2, "down_0": np.ones(4) * 2,
              "up_0": np.ones(4) * 2, "up_1": np.ones(4) * 2}
    for b in range(9):
        layers[f"block_{b}_sep1"] = np.ones(4) * 2
    # residual member norms: channel 0 high in one conv only
    res = np.full((10, 4), 0.1)
    res[3, 0] = 5.0
    from gcc_tpu.compress.prune import (mobile_resnet_cfgs,
                                        mobile_resnet_cfgs_union)
    union_cfg = mobile_resnet_cfgs_union(layers, res, threshold=1.0)
    mean_cfg = mobile_resnet_cfgs(layers, res.mean(axis=0), threshold=1.0)
    assert union_cfg[2] == 1   # any-member rule keeps channel 0
    assert mean_cfg[2] == 0    # mean over 10 convs stays below threshold
