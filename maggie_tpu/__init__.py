"""maggie_tpu: TPU-native (JAX/XLA/Pallas) instance-aware human matting framework.

A ground-up rebuild of the capabilities of hmchuong/MaGGIe (CVPR 2024) designed for
TPU: functional model core, static shapes, on-device uncertainty morphology,
block-sparse Pallas refinement in place of spconv, and pjit data parallelism.
"""

__version__ = "0.1.0"
