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

    def _features(self, s: Structure) -> tuple[str, float, np.ndarray]:
        """(formula, volume/atom, fingerprint) — computed once per structure."""
        return (
            s.composition.reduced_formula,
            s.volume / max(s.num_atoms, 1),
            distance_fingerprint(s, self.k),
        )

    def _fit_features(self, a, b) -> bool:
        f1a, v1, fp1 = a
        f1b, v2, fp2 = b
        if f1a != f1b:
            return False
        if abs(v1 - v2) / max(v1, v2, 1e-9) > self.vtol:
            return False
        valid = (fp1 < 1e5) & (fp2 < 1e5)
        if not valid.any():
            return True
        return bool(np.max(np.abs(fp1[valid] - fp2[valid])) <= self.dtol)

    def fit(self, s1: Structure, s2: Structure) -> bool:
        return self._fit_features(self._features(s1), self._features(s2))

    def unique_mask(self, structures: list[Structure]) -> np.ndarray:
        """True for the first occurrence of each distinct structure.

        Fingerprints are computed once per structure (the 27-image distance
        matrix dominates; recomputing it per pairwise fit made 1000-structure
        gen_eval runs take minutes)."""
        feats = [self._features(s) for s in structures]
        mask = np.ones(len(structures), dtype=bool)
        kept: list = []
        for i, f in enumerate(feats):
            if any(self._fit_features(f, other) for other in kept):
                mask[i] = False
            else:
                kept.append(f)
        return mask

    def novel_mask(
        self, structures: list[Structure], reference: list[Structure]
    ) -> np.ndarray:
        """True where a structure matches nothing in the reference set."""
        by_formula: dict[str, list] = {}
        for r in reference:
            f = self._features(r)
            by_formula.setdefault(f[0], []).append(f)
        out = np.ones(len(structures), dtype=bool)
        for i, s in enumerate(structures):
            f = self._features(s)
            for rf in by_formula.get(f[0], []):
                if self._fit_features(f, rf):
                    out[i] = False
                    break
        return out
