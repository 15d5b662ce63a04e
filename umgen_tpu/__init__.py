"""umgen_tpu — a TPU-native multimodal driving-scene world-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of UMGen
("Generating Multimodal Driving Scenes via Next-Scene Prediction", CVPR 2025).
Each scene frame is a fixed-layout token sequence interleaving four
modalities — ego action, BEV map, traffic agents, front camera — and
generation is next-scene prediction: a temporal-autoregressive (TAR) cascade
produces per-position frame priors and an ordered-autoregressive (OAR)
decoder emits the next frame token-by-token.

Unlike the reference (PyTorch, per-token Python loop with host round-trips),
this framework compiles the whole frame step — ego prediction, TAR cascade,
action-aware map alignment, OAR decode with per-modality sampling, control
injection and the collision rule-constraint — into a single XLA program that
runs entirely on device, scales over a `jax.sharding.Mesh`, and uses Pallas
kernels for the attention hot paths.

Reference behavior citations use `ref:` prefixes and point into the upstream
repository layout (e.g. ``ref:projects/models/UMGen.py:1226``).
"""

from umgen_tpu.version import __version__

__all__ = ["__version__"]
