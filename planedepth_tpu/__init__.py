"""PlaneDepth-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of PlaneDepth.

Self-supervised depth estimation via orthogonal planes (CVPR 2023), with the
full capability surface of svip-lab/PlaneDepth — ResNet/PladeNet/FalNet model
families, the 3-stage training recipe, stereo + monocular warping, and the
KITTI Eigen evaluation protocol — redesigned for TPU: channels-last layouts,
GSPMD data parallelism over a device mesh, and a fused Pallas plane-sweep
kernel on the view-synthesis hot path.
"""

import jax as _jax

# Geometry (poses, homographies, warp grids) must be true float32: the
# backend default matmul precision can silently drop f32 operands to bf16
# (observed 2e-3 errors in 4x4 pose products), which is a visible warp
# artifact.  bf16-typed activations (the conv path) are unaffected by this
# setting — bf16 inputs always use the bf16 MXU path.
_jax.config.update("jax_default_matmul_precision", "float32")

__version__ = "0.1.0"
