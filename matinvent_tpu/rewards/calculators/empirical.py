"""Empirical (no-ML) property calculators.

Capability parity with the reference PyMatGen calculator family
(/root/reference/rewards/calculators/pymatgen/calc.py:47-205): density, HHI
supply-risk, elemental price, (log-)crustal abundance, and substrate lattice
match (MCIA). Implemented natively over the framework's chem layer.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from matinvent_tpu.chem.data import (
    CRUSTAL_ABUNDANCE_PPM,
    ELEMENT_PRICE_USD_PER_KG,
    HHI_RESERVE,
)
from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.base import Calculator


def calc_density(structures: List[Structure]) -> np.ndarray:
    """g/cm^3 per structure (calc.py:47-54 parity)."""
    return np.array([s.density for s in structures], dtype=float)


def calc_hhi(structures: List[Structure]) -> np.ndarray:
    """Composition-weighted (molar fraction) HHI reserve score; NaN when any
    element lacks data (calc.py:57-73 parity — pymatgen's HHIModel weights by
    molar fraction)."""
    out = []
    for s in structures:
        comp = s.composition
        total = comp.num_atoms
        try:
            val = sum(
                HHI_RESERVE[el] * n / total for el, n in comp.counts.items()
            )
        except KeyError:
            val = np.nan
        out.append(val)
    return np.array(out, dtype=float)


def calc_price(structures: List[Structure]) -> np.ndarray:
    """Mass-fraction-weighted USD/kg (calc.py:76-92 parity)."""
    out = []
    for s in structures:
        wf = s.composition.weight_fractions
        try:
            out.append(sum(ELEMENT_PRICE_USD_PER_KG[el] * f for el, f in wf.items()))
        except KeyError:
            out.append(np.nan)
    return np.array(out, dtype=float)


def calc_abundance_crust(structures: List[Structure]) -> np.ndarray:
    """Mass-fraction-weighted crustal abundance in ppm (calc.py:23-44,95-102)."""
    out = []
    for s in structures:
        wf = s.composition.weight_fractions
        try:
            val = sum(CRUSTAL_ABUNDANCE_PPM[el] * f for el, f in wf.items())
        except KeyError:
            val = np.nan
        if not np.isnan(val) and val <= 0.0:
            val = np.nan
        out.append(val)
    return np.array(out, dtype=float)


def calc_log_abundance_crust(structures: List[Structure]) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log10(calc_abundance_crust(structures))


def calc_mcia(
    structures: List[Structure],
    substrate: Structure,
    max_area: float = 400.0,
    max_strain: float = 0.09,
) -> np.ndarray:
    """Minimal coincident interface area (A^2) vs a substrate (001) surface.

    Simplified Zur-McGill ZSL (calc.py:115-160 capability): enumerates integer
    surface supercells of film and substrate (001) lattices up to ``max_area``
    and returns the smallest coincident area whose mean absolute strain is
    below ``max_strain``; NaN when no match exists.
    """
    from matinvent_tpu.rewards.calculators.zsl import min_coincident_area

    out = []
    sub_surf = substrate.lattice[:2, :]
    for s in structures:
        try:
            area = min_coincident_area(
                s.lattice[:2, :], sub_surf, max_area=max_area, max_strain=max_strain
            )
            out.append(area if area is not None else np.nan)
        except Exception:
            out.append(np.nan)
    return np.array(out, dtype=float)


# Common substrates (conventional cells) for MCIA, mirroring the reference's
# substrate CIF directory (rewards/calculators/pymatgen/substrates/*.cif).
def make_substrate(name: str) -> Structure:
    if name == "Si":  # diamond cubic a=5.431
        a = 5.431
        base = np.array(
            [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
        )
        frac = np.vstack([base, base + 0.25])
        return Structure.from_parameters([a] * 3, [90] * 3, [14] * 8, frac % 1.0)
    if name == "GaAs":  # zinc blende a=5.653
        a = 5.653
        fcc = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
        frac = np.vstack([fcc, fcc + 0.25])
        return Structure.from_parameters(
            [a] * 3, [90] * 3, [31] * 4 + [33] * 4, frac % 1.0
        )
    if name == "InP":  # zinc blende a=5.869
        a = 5.869
        fcc = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
        frac = np.vstack([fcc, fcc + 0.25])
        return Structure.from_parameters(
            [a] * 3, [90] * 3, [49] * 4 + [15] * 4, frac % 1.0
        )
    raise ValueError(f"unknown substrate {name}")


class Empirical(Calculator):
    """Task-dispatching empirical calculator (calc.py:163-205 parity)."""

    TASKS = ("density", "hhi", "price", "abundance", "log_abundance", "mcia")

    def __init__(self, root_dir: str, task: str = "density", substrate: str = "Si"):
        super().__init__(root_dir, task)
        if task not in self.TASKS:
            raise ValueError(f"{task} is an unknown task for the Empirical calculator")
        self.substrate = make_substrate(substrate) if task == "mcia" else None

    def calc(
        self,
        samples: Tuple[List[Structure], str],
        label: str = "tmp",
    ) -> np.ndarray:
        structures = samples[0]
        if self.task == "density":
            results = calc_density(structures)
        elif self.task == "hhi":
            results = calc_hhi(structures)
        elif self.task == "price":
            results = calc_price(structures)
        elif self.task == "abundance":
            results = calc_abundance_crust(structures)
        elif self.task == "log_abundance":
            results = calc_log_abundance_crust(structures)
        else:
            results = calc_mcia(structures, self.substrate)
        self.save_results(results, label)
        return results
