from matinvent_tpu.models.batch import CrystalBatch, MAX_ATOMIC_NUM
from matinvent_tpu.models.cspnet import CSPNet
from matinvent_tpu.models.diffcsp import DiffCSPDiffusion

__all__ = ["CrystalBatch", "MAX_ATOMIC_NUM", "CSPNet", "DiffCSPDiffusion"]
