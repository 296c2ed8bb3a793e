from matinvent_tpu.rewards.calculators.base import Calculator
from matinvent_tpu.rewards.calculators.empirical import Empirical
from matinvent_tpu.rewards.calculators.predictor import PropertyPredictor
from matinvent_tpu.rewards.calculators.syn_score import SynScore
from matinvent_tpu.rewards.calculators.dft.calc import DFTCalc
from matinvent_tpu.rewards.calculators.mlip.calc import MLIPBridge
from matinvent_tpu.rewards.calculators.alignn import ALIGNN

__all__ = [
    "Calculator", "Empirical", "PropertyPredictor", "SynScore",
    "DFTCalc", "MLIPBridge", "ALIGNN",
]
