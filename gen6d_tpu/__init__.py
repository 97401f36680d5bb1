"""gen6d_tpu: a TPU-native (JAX/XLA/Pallas) framework for generalizable model-free
6-DoF object pose estimation, with the capabilities of Gen6D (liuyuan-pal/Gen6D).

Subpackages
-----------
- ``geometry``: pure-functional pose / 2D-similarity / camera algebra and solvers
  (jit/vmap-able jnp; replaces the reference's numpy+cv2+transforms3d stack).
- ``ops``: on-device image ops — homography warps, bilinear sampling, resizes with
  exact torch/cv2 conventions, and Pallas kernels for the hot paths.
- ``models``: Flax VGG-11-BN pyramid backbone and the detector / viewpoint-selector /
  volume-refiner networks.
- ``data``: posed-reference-image databases (LINEMOD / GenMOP / custom / synthetic),
  splits, and on-device reference-view preparation.
- ``pipeline``: the ``Gen6DEstimator`` build/predict API with the whole
  detect -> crop -> select -> solve -> refine loop fused on TPU.
- ``train``: losses, metrics, LR schedules, and the training loop.
- ``parallel``: device meshes and shardings (data parallel + reference-view parallel).
"""

__version__ = "0.1.0"
