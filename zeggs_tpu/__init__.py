"""ZEGGS-TPU: a TPU-native (JAX/XLA/Pallas) speech-to-gesture framework.

Re-implementation of the capabilities of ubisoft-laforge-ZeroEGGS (CGF 2023,
"ZeroEGGS: Zero-shot Example-based Gesture Generation from Speech") designed
TPU-first: one pure-functional math core, `lax.scan` autoregressive decoding,
batched FFT/mel front-end, and `pjit` data-parallel training over a
`jax.sharding.Mesh`.

Layout (see SURVEY.md for the reference layer map this covers):
  ops/       pure-jnp quaternion / rot6d / FK / mel kernels (+ Pallas)
  models/    speech encoder, style encoders (GRU/attention, VAE), decoder
  data/      corpus pipeline, windowed dataset, feature extraction
  io/        BVH + WAV host I/O, checkpointing, torch weight conversion
  train/     loss stack, RAdam, pjit'd training loop
  parallel/  device mesh + sharding specs
  infer/     generate_gesture public API
  cli/       train / generate / pipeline entry points
"""

__version__ = "0.1.0"
