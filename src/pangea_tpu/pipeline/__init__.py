from .run import run_build, run_classify
from .checkpoint import Manifest

__all__ = ["run_build", "run_classify", "Manifest"]
