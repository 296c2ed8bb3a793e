from matinvent_tpu.chem.composition import Composition
from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.chem.validity import smact_valid, structure_validity

__all__ = ["Composition", "Structure", "smact_valid", "structure_validity"]
