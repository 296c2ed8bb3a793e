from matinvent_tpu.rewards.reward import Reward, linear_scaling
from matinvent_tpu.rewards.calculators.base import Calculator

__all__ = ["Reward", "linear_scaling", "Calculator"]
