from matinvent_tpu.rewards.calculators.base import Calculator
from matinvent_tpu.rewards.calculators.empirical import Empirical

__all__ = ["Calculator", "Empirical"]
