from matinvent_tpu.models.suite.base import ModelSuite
from matinvent_tpu.models.suite.diffcsp import DiffCSPSuite

__all__ = ["ModelSuite", "DiffCSPSuite"]
