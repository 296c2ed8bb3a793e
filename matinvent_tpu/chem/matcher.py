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


def distance_fingerprint(s: Structure, k: int = 32, tol: float = 0.05) -> np.ndarray:
    """Sorted k smallest DISTINCT off-diagonal minimum-image distances.

    Distances are deduplicated within ``tol`` so multiplicity does not enter
    the fingerprint — an exact supercell then shares its primitive cell's
    spectrum (same distances, higher multiplicity) and matches it."""
    n = s.num_atoms
    dm = s.distance_matrix()
    vals = dm[np.triu_indices(n, k=1)] if n > 1 else np.array([])
    vals = np.unique(np.round(np.sort(vals) / tol)) * tol
    vals = vals[:k]
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

    def features(self, structures: list[Structure]) -> list:
        """Precompute match features once (the 27-image distance matrix
        dominates); pass to unique_mask/novel_mask to share the work."""
        return [self._features(s) for s in structures]

    def unique_mask(
        self, structures: list[Structure], feats: list | None = None
    ) -> np.ndarray:
        """True for the first occurrence of each distinct structure."""
        feats = feats if feats is not None else self.features(structures)
        mask = np.ones(len(structures), dtype=bool)
        kept: list = []
        for i, f in enumerate(feats):
            if any(self._fit_features(f, other) for other in kept):
                mask[i] = False
            else:
                kept.append(f)
        return mask

    def novel_mask(
        self,
        structures: list[Structure],
        reference: list[Structure],
        feats: list | None = None,
    ) -> np.ndarray:
        """True where a structure matches nothing in the reference set."""
        feats = feats if feats is not None else self.features(structures)
        by_formula: dict[str, list] = {}
        for r in reference:
            f = self._features(r)
            by_formula.setdefault(f[0], []).append(f)
        out = np.ones(len(structures), dtype=bool)
        for i, f in enumerate(feats):
            for rf in by_formula.get(f[0], []):
                if self._fit_features(f, rf):
                    out[i] = False
                    break
        return out
