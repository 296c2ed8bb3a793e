import os

DFT_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "config.yaml")

from matinvent_tpu.rewards.calculators.dft.calc import DFTCalc
from matinvent_tpu.rewards.calculators.dft.job import RemoteQueueJob

__all__ = ["DFTCalc", "RemoteQueueJob", "DFT_CONFIG_PATH"]
