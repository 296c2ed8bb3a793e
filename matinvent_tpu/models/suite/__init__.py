from matinvent_tpu.models.suite.base import ModelSuite
from matinvent_tpu.models.suite.diffcsp import DiffCSPSuite
from matinvent_tpu.models.suite.mattergen import MatterGenSuite

__all__ = ["ModelSuite", "DiffCSPSuite", "MatterGenSuite"]
