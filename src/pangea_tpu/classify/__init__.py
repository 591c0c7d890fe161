from .engine import ClassifyConfig, DeviceIndex, make_classify_fn
from .merge import merge_multik_jnp

__all__ = ["ClassifyConfig", "DeviceIndex", "make_classify_fn",
           "merge_multik_jnp"]
