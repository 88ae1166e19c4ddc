from gcc_tpu.engines.common import GANState, apply_net, adam_step  # noqa: F401
