"""Sample validity checks (SMACT-style charge balance + structural sanity).

Capability parity with the reference's ``is_smact_valid`` /
``structure_validity`` imports from mattergen.evaluation
(/root/reference/pipeline/filters/opt_filter.py:15,50-63), implemented
natively: charge-neutral oxidation-state assignment with a Pauling
electronegativity test (alloy exception for all-metal compositions), and a
minimum-interatomic-distance / volume structural screen.
"""
from __future__ import annotations

from functools import lru_cache
from itertools import product

from matinvent_tpu.chem.composition import Composition
from matinvent_tpu.chem.data import ELECTRONEGATIVITY, OXIDATION_STATES
from matinvent_tpu.chem.structure import Structure

# cap on the oxidation-state combination search to bound worst-case cost
_MAX_COMBOS = 200_000


def _pauling_ok(symbols: list[str], ox: tuple[int, ...]) -> bool:
    """Cations must not be more electronegative than anions."""
    cats = [ELECTRONEGATIVITY.get(s) for s, o in zip(symbols, ox) if o > 0]
    ans = [ELECTRONEGATIVITY.get(s) for s, o in zip(symbols, ox) if o < 0]
    if not cats or not ans:
        return False
    cats = [c for c in cats if c is not None]
    ans = [a for a in ans if a is not None]
    if not cats or not ans:
        return True  # missing EN data: don't reject
    return max(cats) <= min(ans)


@lru_cache(maxsize=65536)
def _smact_valid_cached(symbols: tuple[str, ...], counts: tuple[int, ...]) -> bool:
    ox_lists = []
    for s in symbols:
        states = OXIDATION_STATES.get(s, [])
        if not states:
            return False
        ox_lists.append(states)

    # native DFS with charge/Pauling pruning (matinvent_tpu/native); falls
    # back to the Python product enumeration when no toolchain is available
    from matinvent_tpu.native import charge_balanced_native

    ens = [ELECTRONEGATIVITY.get(s) for s in symbols]
    native = charge_balanced_native(ox_lists, list(counts), ens)
    if native is not None:
        return native

    total = 1
    for states in ox_lists:
        total *= len(states)
    if total > _MAX_COMBOS:
        return False
    for combo in product(*ox_lists):
        charge = sum(o * c for o, c in zip(combo, counts))
        if charge != 0:
            continue
        if _pauling_ok(list(symbols), combo):
            return True
    return False


def smact_valid(obj: Structure | Composition) -> bool:
    """Charge-balance validity of a composition.

    A composition passes if (a) it is a single element, (b) all elements are
    metals (alloy exception), or (c) some oxidation-state assignment is charge
    neutral on the reduced formula and electronegativity-consistent.
    """
    comp = obj.composition if isinstance(obj, Structure) else obj
    if "X" in comp.elements:
        return False  # dummy species (e.g. surviving D3PM MASK states)
    if len(comp.elements) == 1:
        return True
    if comp.is_all_metal:
        return True
    red = comp.reduced_counts
    symbols = tuple(sorted(red.keys()))
    counts = tuple(int(red[s]) for s in symbols)
    return _smact_valid_cached(symbols, counts)


def structure_validity(
    structure: Structure,
    cutoff: float = 0.5,
    min_volume: float = 0.1,
) -> bool:
    """Structural sanity: no atom pair closer than ``cutoff`` (Angstrom),
    non-degenerate cell volume, and finite coordinates."""
    import numpy as np

    if not np.isfinite(structure.lattice).all() or not np.isfinite(structure.frac_coords).all():
        return False
    if (structure.species < 1).any() or (structure.species > 100).any():
        return False  # dummy/unknown species
    if structure.volume < min_volume:
        return False
    if structure.num_atoms == 0:
        return False
    return structure.min_interatomic_distance() >= cutoff


def cell_size_ok(structure: Structure, max_length: float = 25.0) -> bool:
    """Reference invalid_filter extra check: max cell edge < 25 A
    (opt_filter.py:53-55)."""
    return bool(structure.lengths.max() < max_length)
