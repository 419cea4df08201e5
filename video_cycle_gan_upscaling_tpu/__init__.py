"""TPU-native video CycleGAN upscaling framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of
``kjedrzejewski/video-cycle_gan-upscaling`` (reference surveyed in SURVEY.md):

- generator zoo (SRGAN ResNet, attention, skip-con, inception-ResNet,
  U-Net-ish variants) and 512-input global discriminators + PatchGAN,
- content (pixel / VGG-perceptual) and adversarial (LSGAN / Wasserstein /
  relativistic) losses,
- single-jitted-update trainers: supervised, cgc (CycleGAN-converted SR),
  paired GAN, relativistic GAN, and full CycleGAN with HBM replay buffer,
- tiled full-frame video inference with overlap-blend reassembly,
- data-parallel training over a ``jax.sharding.Mesh``.

Everything is NHWC, value range [-1, 1] (reference codec parity:
upscaling/upscaler/data.py:253-277), params float32 with bfloat16 compute.
"""

__version__ = "0.1.0"

from video_cycle_gan_upscaling_tpu.utils import config as config  # noqa: F401
