"""video_spike_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for predicting
neural spiking activity from behavioral video, with the full capability surface
of the reference research stack (PPWangyc/video-spike):

- offline ETL producing per-trial tar shards (spikes, behavior, video, optical flow)
- a host->HBM streaming data plane (threaded decode + double-buffered prefetch)
- a model zoo: Linear MLP readout, reduced-rank regression (RRR), ViT-MAE
  (masked autoencoder), contrastive ViT variants, VideoMAE probe, and a
  CEBRA-style contrastive embedder
- supervised + self-supervised trainers with bits-per-spike / R^2 evaluation
- SPMD scaling via jax.sharding Mesh + pjit (data parallel over ICI, optional
  tensor sharding of the large readout matmuls)

Reference capability map: see SURVEY.md at the repo root. Individual modules
cite the reference files (file:line) whose *behavior* they reproduce; all code
here is written TPU-first rather than translated.
"""

__version__ = "0.1.0"

from video_spike_tpu.core.registry import NAME2MODEL, register_model  # noqa: F401
