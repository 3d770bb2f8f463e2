"""accel_tpu — TPU-native video semantic segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SamvitJ/Accel
(CVPR 2019, arXiv:1807.06667) and its Deep-Feature-Flow substrate
(arXiv:1611.07715):

- DeepLab dilated-ResNet reference branch on sparse keyframes
- FlowNet-S optical flow (+ DFF scale-field modulation)
- Flow-guided bilinear warp of keyframe score maps (Pallas TPU kernel,
  pure-XLA gather oracle)
- Lightweight update branch + 1x1 corrective fusion, end-to-end in one
  fused XLA program per frame
- Clip-batched inference via lax.scan with the keyframe cache as carry;
  data/spatial sharding over a jax.sharding.Mesh

Reference layout citations in docstrings use repo-relative paths of
SamvitJ/Accel as catalogued in SURVEY.md (the mount was empty at build
time; see SURVEY.md provenance warning).
"""

__version__ = "0.1.0"

from accel_tpu.config import Config, load_config, default_config  # noqa: F401
