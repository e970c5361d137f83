"""dcgan_sr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) DCGAN super-resolution framework.

Re-implements, TPU-first, every capability of the Torch7 reference
PJunhyuk/dcgan-super-resolution (seven training variants over one parameterized
system: 2x box-downsample degradation, hourglass conv/conv-transpose generators,
DCGAN-64 and patch-8 discriminators, MSE error-regression and BCE label schemes,
folder/indexed data paths, full-image and tiled/overlap-seam inference, PSNR/SSIM
evaluation against a bilinear control).

Layer map (reference -> here):
  L1 device/runtime  -> JAX/XLA on a jax.sharding.Mesh          (parallel/)
  L2 nn/ops          -> ops/ (conv, conv_transpose, batchnorm, adam) as XLA ops
  L3 data pipeline   -> data/ (folder indexer, indexed reader, prefetcher)
  L4 train loop      -> train/ (single fused jitted train_step, epoch driver)
  L5 eval/inference  -> metrics/, infer/ (PSNR/SSIM, tiled + seam-cut stitch)
  L6 entry scripts   -> core/config.py named variants + cli.py
"""

__version__ = "0.1.0"
