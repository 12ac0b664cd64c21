"""pulseportraiture_tpu: TPU-native wideband pulsar timing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
PulsePortraiture (Pennucci, Demorest, & Ransom 2014; Pennucci 2019):
wideband TOA/DM measurement via an extended-FFTFIT likelihood, Gaussian and
PCA/B-spline portrait modeling, alignment/averaging, channel zapping, and
simulation — redesigned for batched, sharded execution on TPU meshes.

Layers (see SURVEY.md):
  ops/       L1 Fourier-domain portrait algebra (rotation, scattering, noise)
  fitters/   L2 jit/vmap fitters (FFTFIT, 2-param and 5-param portrait fits)
  models/    L3 model builders (Gaussian components, PCA + splines)
  io/        L0/L5 archive + model + TOA file formats
  sim/       synthetic data generation
  pipelines/ L4 measurement pipelines (TOAs, alignment, zapping)
  parallel/  device-mesh sharding helpers
"""

__version__ = "0.1.0"
