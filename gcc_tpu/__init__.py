"""GCC-TPU: a TPU-native GAN compression framework.

A from-scratch JAX / Flax / pjit / Pallas re-design of the capabilities of
SJLeo/GCC ("Revisiting Discriminator in GAN Compression", NeurIPS 2021):
structured channel pruning of GAN generators under a MACs budget, online
distillation from a simultaneously-trained teacher, and DARTS-style
discriminator capacity search via learnable channel masks — for the
Pix2Pix, CycleGAN, SAGAN and SRGAN families.

Reference behavior surface: /root/reference (train.py, models/*, utils/prune_util.py).
This is not a port: compute is jitted XLA/Pallas over a `jax.sharding.Mesh`,
pruning is analytic (no model rebuilds in the search loop), and the
teacher+student+arch cooperative update is a single compiled step.
"""

__version__ = "0.1.0"

from gcc_tpu.config import Config  # noqa: F401
