"""maggie_tpu: TPU-native (JAX/XLA/Pallas) instance-aware human matting framework.

A ground-up rebuild of the capabilities of hmchuong/MaGGIe (CVPR 2024) designed for
TPU: functional model core, static shapes, on-device uncertainty morphology,
block-sparse Pallas refinement in place of spconv, and pjit data parallelism.
"""

__version__ = "0.1.0"


def from_pretrained(weights, config=None, fold_sn=True, overrides=None):
    """One-call model loading (the reference's ``MaGGIe.from_pretrained``
    surface); see ``maggie_tpu.pretrained``. Lazy import: keeps bare
    ``import maggie_tpu`` free of jax/flax import cost."""
    from .pretrained import from_pretrained as _fp
    return _fp(weights, config=config, fold_sn=fold_sn, overrides=overrides)
