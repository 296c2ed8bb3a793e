"""Lightweight structure matcher for uniqueness/novelty screening.

Capability stand-in for pymatgen's ``StructureMatcher`` as used by the
reference eval stack (/root/reference/pipeline/filters/opt_filter.py:17-20,
82-86). Exact Niggli+group-theoretic matching is out of scope; this matcher
uses a rotation/translation/permutation-invariant fingerprint:

* reduced formula must match;
* volume per atom within ``vtol`` (relative);
* sorted minimum-image pairwise-distance spectrum within ``dtol`` (absolute,
  Angstrom) after normalizing atom count.

This is intentionally stricter-on-composition / looser-on-geometry than
pymatgen's matcher — adequate for RL dedup and novelty screens, and swappable
for an exact matcher without touching callers.
"""
from __future__ import annotations

import numpy as np

from matinvent_tpu.chem.structure import Structure


def distance_fingerprint(s: Structure, k: int = 32) -> np.ndarray:
    """Sorted k smallest off-diagonal minimum-image distances."""
    n = s.num_atoms
    dm = s.distance_matrix()
    vals = dm[np.triu_indices(n, k=1)] if n > 1 else np.array([])
    vals = np.sort(vals)[:k]
    out = np.full(k, 1e6)
    out[: len(vals)] = vals
    return out


class StructureMatcher:
    def __init__(self, vtol: float = 0.1, dtol: float = 0.3, k: int = 32):
        self.vtol = vtol
        self.dtol = dtol
        self.k = k

    def fit(self, s1: Structure, s2: Structure) -> bool:
        if s1.composition.reduced_formula != s2.composition.reduced_formula:
            return False
        v1 = s1.volume / max(s1.num_atoms, 1)
        v2 = s2.volume / max(s2.num_atoms, 1)
        if abs(v1 - v2) / max(v1, v2, 1e-9) > self.vtol:
            return False
        f1 = distance_fingerprint(s1, self.k)
        f2 = distance_fingerprint(s2, self.k)
        valid = (f1 < 1e5) & (f2 < 1e5)
        if not valid.any():
            return True
        return bool(np.max(np.abs(f1[valid] - f2[valid])) <= self.dtol)

    def unique_mask(self, structures: list[Structure]) -> np.ndarray:
        """True for the first occurrence of each distinct structure."""
        mask = np.ones(len(structures), dtype=bool)
        kept: list[Structure] = []
        for i, s in enumerate(structures):
            if any(self.fit(s, other) for other in kept):
                mask[i] = False
            else:
                kept.append(s)
        return mask

    def novel_mask(
        self, structures: list[Structure], reference: list[Structure]
    ) -> np.ndarray:
        """True where a structure matches nothing in the reference set."""
        # bucket reference by reduced formula to avoid O(N*M) fits
        by_formula: dict[str, list[Structure]] = {}
        for r in reference:
            by_formula.setdefault(r.composition.reduced_formula, []).append(r)
        out = np.ones(len(structures), dtype=bool)
        for i, s in enumerate(structures):
            for r in by_formula.get(s.composition.reduced_formula, []):
                if self.fit(s, r):
                    out[i] = False
                    break
        return out
