"""gazenerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of GazeNeRF (CVPR 2023): 3D-aware gaze redirection with a
two-stream conditional NeRF, built from scratch for TPU hardware.

Layer map (mirrors SURVEY.md §1 of the reference analysis):

* ``gazenerf_tpu.ops``      — core volumetric-rendering math (rays, sampling,
                              integration, rotations, image ops)
* ``gazenerf_tpu.kernels``  — Pallas TPU kernels (fused ray-march + MLP)
* ``gazenerf_tpu.models``   — field MLPs, neural renderer, full GazeNeRF,
                              PatchGAN, frozen perceptual nets
* ``gazenerf_tpu.losses``   — training loss stack
* ``gazenerf_tpu.train``    — train state, optimizer, loops, checkpointing
* ``gazenerf_tpu.parallel`` — mesh / sharding layouts (data + ray axes)
* ``gazenerf_tpu.data``     — HDF5 input pipeline + synthetic data factory
* ``gazenerf_tpu.eval``     — metrics + evaluation protocols + render loops
"""

__version__ = "0.1.0"

from gazenerf_tpu.config import Config, ModelConfig, small_test_config

__all__ = ["Config", "ModelConfig", "small_test_config", "__version__"]
