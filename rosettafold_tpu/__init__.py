"""rosettafold_tpu — a TPU-native (JAX/XLA/Pallas/pjit) RoseTTAFold framework.

Built from scratch with the capability surface of dohlee/rosettafold-pytorch
(three-track protein structure prediction: MSA track, pair track, SE(3) structure
track), re-designed for TPU: static shapes, MXU-shaped einsums, masked dense
neighborhoods instead of dynamic graphs, FAVOR+ linear attention, and
mesh-sharded training via jax.sharding.
"""

from .config import RoseTTAFoldConfig, PerformerConfig, tiny_config

__all__ = [
    "RoseTTAFoldConfig",
    "PerformerConfig",
    "tiny_config",
    "RoseTTAFold",
    "predict",
    "fit",
]

_LAZY = {
    "RoseTTAFold": ("rosettafold_tpu.models.rosettafold", "RoseTTAFold"),
    "predict": ("rosettafold_tpu.predict", "predict"),
    "fit": ("rosettafold_tpu.train.loop", "fit"),
}


def __getattr__(name):
    # Lazy imports so light-weight users (config-only) do not pay model import cost.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
