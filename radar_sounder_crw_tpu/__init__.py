"""radar_sounder_crw_tpu — TPU-native framework for radar-sounder segmentation.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
jdalcorso/radar-sounder-crw (TGRS 2024): unsupervised Contrastive Random Walk
(CRW) pretraining of a patch-column encoder, user-guided top-k masked-attention
label propagation, horizontality/change-point analysis with correction and
bidirectional integration, and a supervised UNet baseline.

Layer map (bottom → top):
  data/      radargram IO, patch-grid geometry, windowing, synthetic data
  models/    flax encoders (CNN, ResNet-10), UNet, torch weight import
  ops/       CRW objective, label propagation, metrics, PELT, Pallas kernels
  parallel/  device mesh + sharding helpers (pjit/shard_map data-parallel)
  train/     optax trainers, Orbax checkpointing, ASHA-style tuner
  infer/     full propagation pipeline (encode→xent→PELT→propagate→correct)
  utils/     pos-embed, plotting, profiling, config
"""

__version__ = "0.1.0"
