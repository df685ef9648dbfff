"""srcgan_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution + colorization framework.

A ground-up rebuild of the capabilities of huster-wgm/SRCGAN (PyTorch, single-GPU)
as an idiomatic JAX framework: functional models over explicit parameter pytrees,
jit-compiled fused train steps, data-parallel execution over a `jax.sharding.Mesh`,
and Pallas TPU kernels for the hot fused ops.

Layout convention: all image tensors are NHWC (TPU-friendly), float32 in [0, 1]
unless stated otherwise.  The reference uses NCHW; drivers and datasets here
produce NHWC directly.

Subpackages
-----------
- ``srcgan_tpu.nn``       minimal functional module system (init/apply)
- ``srcgan_tpu.ops``      core image/conv ops with PyTorch-parity semantics
- ``srcgan_tpu.models``   the model zoo (RDDBNet, ResDeconv, ESPCN, ... + registry)
- ``srcgan_tpu.losses``   training losses (L1/MSE/PSNR/SSIM/GAN/focal/...)
- ``srcgan_tpu.metrics``  eval metrics (MSE/PSNR/AE/SSIM)
- ``srcgan_tpu.data``     file-list datasets, on-device preprocessing, prefetch
- ``srcgan_tpu.train``    trainers (cascaded SR->colorize, CycleGAN), optimizers
- ``srcgan_tpu.parallel`` device mesh, sharding rules, data-parallel step wrappers
- ``srcgan_tpu.utils``    logging, checkpointing, image IO
"""

__version__ = "0.1.0"
