"""Structure matchers for uniqueness/novelty screening.

Three tiers, mirroring how the reference eval stack matches structures
(/root/reference/pipeline/filters/opt_filter.py:17-20, 82-86 via mattergen's
DefaultOrderedStructureMatcher / DefaultDisorderedStructureMatcher):

* ``StructureMatcher`` — fast rotation/translation/permutation-invariant
  fingerprint (reduced formula + volume/atom + minimum-image distance
  spectrum). Cheap; used for RL dedup where throughput matters
  (``structure_matcher: "fast"``).
* ``ExactStructureMatcher`` / ``OrderedStructureMatcher`` — the
  pymatgen-style geometric fit: Niggli reduction, volume normalization,
  unimodular lattice-correspondence search under (ltol, angle_tol),
  anchor-translation search, per-species optimal assignment on
  minimum-image distances, and the normalized-RMS site criterion under
  stol. Defaults match pymatgen (ltol=0.2, stol=0.3, angle_tol=5).
* ``DisorderedExactStructureMatcher`` / ``DisorderedStructureMatcher`` —
  the composition-anonymized tier: same geometric criteria, but species
  enter only through a bijective relabeling with compatible stoichiometry
  (pymatgen anonymous-fit semantics, the core of mattergen's
  DefaultDisorderedStructureMatcher used by the reference's gen_eval,
  scripts/gen_eval.sh:27).
"""
from __future__ import annotations

from functools import lru_cache
from itertools import product

import numpy as np

from matinvent_tpu.chem.structure import Structure


def distance_fingerprint(
    s: Structure, k: int = 32, tol: float = 0.05, scale: float = 1.0
) -> np.ndarray:
    """Sorted k smallest DISTINCT off-diagonal minimum-image distances.

    Distances are deduplicated within ``tol`` so multiplicity does not enter
    the fingerprint — an exact supercell then shares its primitive cell's
    spectrum (same distances, higher multiplicity) and matches it.

    ``scale``: divide distances by this BEFORE deduplication. For a
    scale-invariant spectrum pass (V/n)^(1/3): dedup bins then land at the
    same normalized positions for volume-scaled copies (binning absolute
    distances and normalizing after merges/splits bins inconsistently
    across scales)."""
    n = s.num_atoms
    dm = s.distance_matrix() / scale
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
        # The RL loop calls this every iteration with the SAME reference list
        # (OptFilter.reference.structures); featurizing a 12k-structure
        # reference costs ~10 s per call on this host, so memoize the
        # formula-bucketed reference features keyed by list identity.
        key = (id(reference), len(reference))
        cached = getattr(self, "_ref_feat_cache", None)
        if cached is not None and cached[0] == key:
            by_formula = cached[1]
        else:
            by_formula = {}
            for r in reference:
                f = self._features(r)
                by_formula.setdefault(f[0], []).append(f)
            self._ref_feat_cache = (key, by_formula)
        out = np.ones(len(structures), dtype=bool)
        for i, f in enumerate(feats):
            for rf in by_formula.get(f[0], []):
                if self._fit_features(f, rf):
                    out[i] = False
                    break
        return out


@lru_cache(maxsize=1)
def _unimodular_candidates() -> np.ndarray:
    """All 3x3 integer matrices with entries in {-1,0,1} and det +-1.

    Two Niggli-reduced cells describing the same lattice are related by a
    unimodular change of basis whose entries are small; scanning this set
    covers every correspondence the reduced cells can require."""
    out = []
    for entries in product((-1, 0, 1), repeat=9):
        m = np.array(entries, dtype=np.int64).reshape(3, 3)
        d = round(np.linalg.det(m))
        if d in (1, -1):
            out.append(m)
    return np.stack(out)  # [3480, 3, 3]


class ExactStructureMatcher:
    """pymatgen-default-equivalent ordered structure fit (see module doc)."""

    def __init__(
        self,
        ltol: float = 0.2,
        stol: float = 0.3,
        angle_tol: float = 5.0,
        scale: bool = True,
        primitive_cell: bool = True,
        use_native: bool = True,
    ):
        self.ltol = ltol
        self.stol = stol
        self.angle_tol = angle_tol
        self.scale = scale
        # pymatgen StructureMatcher(primitive_cell=True) semantics: both
        # structures reduce to their primitive cells before fitting, so an
        # exact 2x supercell matches its primitive (the reference corpora
        # store primitives; generated cells need not be primitive)
        self.primitive_cell = primitive_cell
        # the C++ core (native/structure_fit.cpp) runs the identical
        # mapping x relabeling x anchor x assignment search ~100x faster;
        # use_native=False pins the pure-Python reference implementation
        # (and is the automatic fallback when the toolchain is missing)
        self.use_native = use_native

    # ------------------------------------------------------------ internals
    @staticmethod
    def _niggli(s: Structure) -> Structure:
        from matinvent_tpu.chem.niggli import niggli_reduce

        return niggli_reduce(s)

    @staticmethod
    def _params(lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lengths = np.linalg.norm(lat, axis=1)
        cos = np.array(
            [
                np.dot(lat[1], lat[2]) / (lengths[1] * lengths[2]),
                np.dot(lat[0], lat[2]) / (lengths[0] * lengths[2]),
                np.dot(lat[0], lat[1]) / (lengths[0] * lengths[1]),
            ]
        )
        angles = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
        return lengths, angles

    def _lattice_mappings(self, l1: np.ndarray, l2: np.ndarray) -> list[np.ndarray]:
        """Unimodular M with M @ l2 ~ l1 under (ltol, angle_tol)."""
        len1, ang1 = self._params(l1)
        cands = _unimodular_candidates()
        new_lats = cands @ l2  # [K, 3, 3]
        lengths = np.linalg.norm(new_lats, axis=2)  # [K, 3]
        ok = np.all(np.abs(lengths - len1) / len1 <= self.ltol, axis=1)
        out = []
        for m, lat in zip(cands[ok], new_lats[ok]):
            _, ang = self._params(lat)
            if np.all(np.abs(ang - ang1) <= self.angle_tol):
                out.append(m)
        return out

    def _sites_fit(
        self,
        gram: np.ndarray,
        f1: np.ndarray,
        f2: np.ndarray,
        sp1: np.ndarray,
        sp2: np.ndarray,
        norm: float,
    ) -> bool:
        """Anchor-translation + per-species assignment RMS test.

        Distances use the (rotation-invariant) metric tensor ``gram`` —
        the two cells generally sit in different Cartesian orientations, so
        comparing through their matrices directly would be meaningless."""
        from scipy.optimize import linear_sum_assignment

        # anchor on the rarest species
        vals, counts = np.unique(sp1, return_counts=True)
        anchor_sp = vals[np.argmin(counts)]
        a_idx = np.where(sp1 == anchor_sp)[0][0]
        for b_idx in np.where(sp2 == anchor_sp)[0]:
            shift = f2[b_idx] - f1[a_idx]
            f2s = f2 - shift
            sq_sum, n_tot = 0.0, 0
            for spv in vals:
                i1 = np.where(sp1 == spv)[0]
                i2 = np.where(sp2 == spv)[0]
                d = f1[i1][:, None, :] - f2s[None, i2, :]
                d -= np.round(d)  # minimum image in frac space
                dist2 = np.einsum("ijk,kl,ijl->ij", d, gram, d)
                r, c = linear_sum_assignment(dist2)
                sq_sum += float(dist2[r, c].sum())
                n_tot += len(i1)
            if np.sqrt(max(sq_sum, 0.0) / n_tot) / norm <= self.stol:
                return True
        return False

    # ------------------------------------------------------------------ api
    def prepare(self, s: Structure):
        """Per-structure precompute (primitive + Niggli reduction + arrays) —
        cacheable by callers that fit the same structure against many
        others. The atom count compared in ``fit_prepared`` is the PRIMITIVE
        count when ``primitive_cell`` is on, so a supercell and its
        primitive land on the same comparison size."""
        if self.primitive_cell:
            from matinvent_tpu.chem.niggli import primitive_reduce

            s = primitive_reduce(s)
        r = self._niggli(s)
        return (
            s.composition.reduced_formula,
            s.num_atoms,
            np.asarray(r.lattice, dtype=np.float64),
            np.asarray(r.frac_coords) % 1.0,
            np.asarray(r.species),
        )

    def _species_relabelings(
        self, form1: str, sp1: np.ndarray, form2: str, sp2: np.ndarray
    ) -> list[np.ndarray]:
        """Candidate species arrays for structure 2, in structure-1's
        species vocabulary. Ordered semantics: identity only, and only when
        the reduced formulas agree."""
        if form1 != form2:
            return []
        return [sp2]

    def fit_prepared(self, p1, p2) -> bool:
        form1, n1, l1, f1, sp1 = p1
        form2, n2, l2, f2, sp2 = p2
        if n1 != n2:
            return False  # same-cell comparison; supercell mode not needed
        relabelings = self._species_relabelings(form1, sp1, form2, sp2)
        if not relabelings:
            return False
        if self.use_native:
            from matinvent_tpu.native import structure_fit_native

            native = structure_fit_native(
                l1, f1, sp1, l2, f2, relabelings,
                self.ltol, self.stol, self.angle_tol, self.scale,
            )
            if native is not None:
                return native
        if self.scale:
            # normalize both to unit volume/atom (pymatgen scale=True)
            v1 = abs(np.linalg.det(l1)) / n1
            v2 = abs(np.linalg.det(l2)) / n2
            if v1 <= 0 or v2 <= 0:
                return False
            l1 = l1 / np.cbrt(v1)
            l2 = l2 / np.cbrt(v2)
            norm = 1.0  # (V/n)^(1/3) after scaling
        else:
            # pymatgen normalizes site RMS by the average free length
            v1 = abs(np.linalg.det(l1)) / max(n1, 1)
            v2 = abs(np.linalg.det(l2)) / max(n2, 1)
            norm = float(np.cbrt(max(0.5 * (v1 + v2), 1e-12)))
        g1 = l1 @ l1.T
        for m in self._lattice_mappings(l1, l2):
            l2m = m @ l2
            gram = 0.5 * (g1 + l2m @ l2m.T)  # average metric tensor
            f2m = (f2 @ np.linalg.inv(m)) % 1.0
            for sp2r in relabelings:
                if self._sites_fit(gram, f1, f2m, sp1, sp2r, norm):
                    return True
        return False

    def fit(self, s1: Structure, s2: Structure) -> bool:
        return self.fit_prepared(self.prepare(s1), self.prepare(s2))


def anonymous_formula(species: np.ndarray) -> str:
    """Species-blind reduced formula, e.g. Ca(TiO3) -> 'A1B1C3'."""
    _, counts = np.unique(np.asarray(species), return_counts=True)
    counts = np.sort(counts)
    g = int(np.gcd.reduce(counts)) if len(counts) else 1
    return "".join(
        f"{chr(ord('A') + i)}{c // g}" for i, c in enumerate(counts)
    )


class DisorderedExactStructureMatcher(ExactStructureMatcher):
    """Composition-anonymized exact geometric fit.

    The reference's offline eval matches with mattergen's
    DefaultDisorderedStructureMatcher
    (/root/reference/scripts/gen_eval.sh:27, imported at
    pipeline/filters/opt_filter.py:17-20), whose core semantics are
    pymatgen's anonymous fit: two ordered crystals are equivalent when some
    BIJECTIVE species relabeling with compatible stoichiometry maps one onto
    the other under the same geometric criteria as the ordered fit (Niggli +
    unimodular lattice search + assignment RMS under stol). Site assignment
    still respects the (relabeled) species partition — sites of different
    anonymized species never pair.
    """

    #: cap on enumerated bijections per pair (groups of equal-count species
    #: explode factorially in pathological many-species cells)
    MAX_RELABELINGS = 720

    def prepare(self, s: Structure):
        form, n, lat, frac, sp = super().prepare(s)
        return (anonymous_formula(sp), n, lat, frac, sp)

    def _species_relabelings(self, form1, sp1, form2, sp2):
        from itertools import permutations

        if form1 != form2:  # anonymized formulas incompatible
            return []
        v1, c1 = np.unique(sp1, return_counts=True)
        v2, c2 = np.unique(sp2, return_counts=True)
        if len(v1) != len(v2) or sorted(c1) != sorted(c2):
            return []
        # group species by site count; bijections permute within groups
        groups1: dict[int, list] = {}
        groups2: dict[int, list] = {}
        for v, c in zip(v1, c1):
            groups1.setdefault(int(c), []).append(v)
        for v, c in zip(v2, c2):
            groups2.setdefault(int(c), []).append(v)
        per_group = []
        for c, g1 in sorted(groups1.items()):
            g2 = groups2[c]
            per_group.append([list(zip(g1, p)) for p in permutations(g2)])
        out = []
        for combo in product(*per_group):
            mapping = {b: a for pairs in combo for a, b in pairs}
            out.append(np.array([mapping[v] for v in sp2]))
            if len(out) >= self.MAX_RELABELINGS:
                break
        return out


class OrderedStructureMatcher(StructureMatcher):
    """Exact ordered matching behind the fast-matcher list API.

    The fingerprint acts as a loosened prefilter (a pair whose distance
    spectra disagree beyond the slack cannot fit under stol); every
    surviving candidate pair is confirmed by the pymatgen-style geometric
    ``ExactStructureMatcher.fit``. This is the ``structure_matcher:
    "ordered"`` mode of OptFilter/OptEval — novelty/uniqueness computed
    this way is comparable to reference-published metrics.
    """

    def __init__(self, exact: ExactStructureMatcher | None = None):
        super().__init__(vtol=0.25, dtol=0.6)  # deliberately loose prefilter
        self.exact = exact or ExactStructureMatcher()
        # prefilter slack on the unit-volume/atom-normalized spectrum when
        # the exact fit is scale-invariant (dimensionless; 0.6 Å at a
        # typical (V/n)^(1/3) ≈ 2.4 Å)
        self.ndtol = 0.25

    def _features(self, s: Structure):
        # per-structure precompute: fingerprint for the prefilter (in
        # normalized-distance space when the exact fit is scale-invariant,
        # so dedup bins align across volume-scaled copies) + the
        # primitive+Niggli-reduced arrays for the exact fit — computed once,
        # reused across every O(N²) pair comparison.
        # The fingerprint comes from the REDUCED structure: a supercell's
        # minimum-image spectrum interleaves non-minimal-image distances its
        # primitive lacks, so raw-structure fingerprints falsely prefilter
        # supercell-vs-primitive pairs the exact fit (primitive_cell=True)
        # matches
        prepared = self.exact.prepare(s)
        rs = Structure(prepared[2], prepared[4], prepared[3])
        base = super()._features(rs)
        if self.exact.scale:
            norm = np.cbrt(max(rs.volume / max(rs.num_atoms, 1), 1e-9))
            fp = distance_fingerprint(rs, self.k, tol=0.02, scale=norm)
            base = (base[0], base[1], fp)
        return (*base, prepared)

    def _fit_features(self, a, b) -> bool:
        fa, va, fpa = a[:3]
        fb, vb, fpb = b[:3]
        if fa != fb:
            return False
        if self.exact.scale:
            # scale=True matches volume-scaled copies: compare the
            # normalized spectra and skip the absolute-volume check.
            # Only comparable when both spectra resolved the same number of
            # distinct distances — a jittered duplicate can merge/split a
            # bin, shifting every later slot, so a count mismatch falls
            # through to the exact fit instead of rejecting
            na, nb = int((fpa < 1e5).sum()), int((fpb < 1e5).sum())
            valid = (fpa < 1e5) & (fpb < 1e5)
            if na == nb and valid.any() and (
                np.max(np.abs(fpa[valid] - fpb[valid])) > self.ndtol
            ):
                return False
        # explicit base call (not zero-arg super()): this method is borrowed
        # by DisorderedStructureMatcher, whose zero-arg super() cell would be
        # bound to the wrong class and raise TypeError in this branch
        elif not StructureMatcher._fit_features(self, a[:3], b[:3]):
            return False
        return self.exact.fit_prepared(a[3], b[3])

    def fit(self, s1: Structure, s2: Structure) -> bool:
        return self._fit_features(self._features(s1), self._features(s2))


class DisorderedStructureMatcher(StructureMatcher):
    """Composition-anonymized exact matching behind the fast list API.

    Mirrors ``OrderedStructureMatcher``: the species-blind distance-spectrum
    fingerprint prefilters candidate pairs (grouped by *anonymized* formula),
    and every survivor is confirmed by
    ``DisorderedExactStructureMatcher.fit``. This is the
    ``structure_matcher: "disordered"`` tier of OptFilter/OptEval/gen_eval —
    comparable to reference metrics computed with mattergen's
    DefaultDisorderedStructureMatcher.
    """

    def __init__(self, exact: DisorderedExactStructureMatcher | None = None):
        super().__init__(vtol=0.25, dtol=0.6)
        self.exact = exact or DisorderedExactStructureMatcher()
        self.ndtol = 0.25

    def _features(self, s: Structure):
        # fingerprint the REDUCED structure (see OrderedStructureMatcher
        # _features: raw supercell spectra falsely prefilter pairs the
        # primitive_cell=True exact fit matches)
        prepared = self.exact.prepare(s)
        rs = Structure(prepared[2], prepared[4], prepared[3])
        vpa = rs.volume / max(rs.num_atoms, 1)
        if self.exact.scale:
            norm = np.cbrt(max(vpa, 1e-9))
            fp = distance_fingerprint(rs, self.k, tol=0.02, scale=norm)
        else:
            fp = distance_fingerprint(rs, self.k)
        # slot 0 = anonymized formula: unique_mask/novel_mask group by it
        return (prepared[0], vpa, fp, prepared)

    _fit_features = OrderedStructureMatcher._fit_features

    def fit(self, s1: Structure, s2: Structure) -> bool:
        return self._fit_features(self._features(s1), self._features(s2))
