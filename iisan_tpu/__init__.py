"""iisan_tpu: a TPU-native rebuild of GAIR-Lab/IISAN (JAX/Flax/Pallas).

Parameter-efficient multimodal sequential recommendation via decoupled
intra-/inter-modal side adapter networks over frozen foundation models,
re-designed for TPU: XLA-compiled towers with Pallas fused attention,
device-resident hidden-state caches, scan-compiled epochs, pjit data
parallelism over ICI.  See SURVEY.md for the reference structural analysis.
"""

from .config import IISANConfig

__version__ = "0.1.0"
__all__ = ["IISANConfig"]
