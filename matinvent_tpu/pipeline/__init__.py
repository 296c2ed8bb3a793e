from matinvent_tpu.pipeline.base import ReinL
from matinvent_tpu.pipeline.mat_invent import MatInvent
from matinvent_tpu.pipeline.baseline import Baseline
from matinvent_tpu.pipeline.filters import invalid_filter, OptFilter, OptEval

__all__ = ["ReinL", "MatInvent", "Baseline", "invalid_filter", "OptFilter", "OptEval"]
