"""AVMoE-TPU: a TPU-native (JAX/XLA/Pallas) audio-visual mixture-of-experts framework.

A ground-up rebuild of the capabilities of the AVMoE reference (NeurIPS 2024,
"Mixture of Experts for Audio-Visual Learning"): frozen Swin-V2 / HTS-AT
backbones run in lock-step with trainable cross-modal + unimodal adapter
experts gated by a soft router, feeding task heads for

  * AVE  - audio-visual event localization
  * AVVP - weakly-supervised audio-visual video parsing
  * AVQA - audio-visual question answering
  * AVS  - audio-visual sound-source segmentation (S4 / MS3)

Design is TPU-first: channels-last layouts, GEMM-native signal processing,
windowed attention written blockwise, dense device-local expert mixtures
(no all-to-all), and data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
