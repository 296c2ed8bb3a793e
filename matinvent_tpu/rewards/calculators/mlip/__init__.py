import os

_HERE = os.path.dirname(__file__)
ELASTIC_PATH = os.path.join(_HERE, "elastic.py")
PHONON_PATH = os.path.join(_HERE, "phonon.py")

from matinvent_tpu.rewards.calculators.mlip.calc import MLIPBridge

__all__ = ["MLIPBridge", "ELASTIC_PATH", "PHONON_PATH"]
