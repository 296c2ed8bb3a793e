"""Convex-hull stability tests against analytic phase diagrams."""
import numpy as np
import pytest

from matinvent_tpu.chem.composition import Composition
from matinvent_tpu.chem.ehull import ConvexHullReference, PhaseEntry, stable_mask
from matinvent_tpu.chem.structure import Structure


def ref_binary():
    # elements at 0 eV/atom, one stable compound AB at -1 eV/atom
    return ConvexHullReference(
        [
            PhaseEntry.make("Na", 0.0),
            PhaseEntry.make("Cl", 0.0),
            PhaseEntry.make("NaCl", -1.0),
        ]
    )


class TestHullEnergy:
    def test_elemental_endpoints(self):
        ref = ref_binary()
        assert ref.hull_energy(Composition("Na")) == pytest.approx(0.0, abs=1e-9)

    def test_known_compound_on_hull(self):
        ref = ref_binary()
        assert ref.hull_energy(Composition("NaCl")) == pytest.approx(-1.0, abs=1e-9)

    def test_interpolated_hull(self):
        # Na3Cl = 0.75 Na + 0.25 Cl fractions -> mixture of Na and NaCl:
        # x_Cl = 0.25 -> 0.5 * NaCl + 0.5 * Na -> hull = -0.5 eV/atom
        ref = ref_binary()
        assert ref.hull_energy(Composition("Na3Cl")) == pytest.approx(-0.5, abs=1e-9)

    def test_e_above_hull(self):
        ref = ref_binary()
        # a NaCl polymorph at -0.8 eV/atom is 0.2 above the hull
        assert ref.energy_above_hull(Composition("NaCl"), -0.8) == pytest.approx(0.2)

    def test_unknown_element_nan(self):
        ref = ref_binary()
        assert np.isnan(ref.hull_energy(Composition("KCl")))

    def test_ternary_hull(self):
        ref = ConvexHullReference(
            [
                PhaseEntry.make("Li", 0.0),
                PhaseEntry.make("Fe", 0.0),
                PhaseEntry.make("O", 0.0),
                PhaseEntry.make("Li2O", -2.0),
                PhaseEntry.make("Fe2O3", -1.5),
            ]
        )
        # LiFeO2 decomposes into 0.5 Li2O (3 atoms) + ... check it's <= both
        e = ref.hull_energy(Composition("LiFeO2"))
        assert np.isfinite(e) and e < 0.0


class TestStableMask:
    def test_mask_with_total_energies(self):
        ref = ref_binary()
        s = Structure.from_parameters(
            [5, 5, 5], [90, 90, 90], [11, 17], np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
        )
        # total energies: -2.0 eV for 2 atoms = -1.0/atom (on hull) vs -1.0 eV
        # total = -0.5/atom (0.5 above hull)
        mask = stable_mask([s, s], [-2.0, -1.0], ref, threshold=0.1)
        np.testing.assert_array_equal(mask, [True, False])

    def test_opt_filter_integration(self):
        from matinvent_tpu.pipeline.filters import OptFilter, ReferenceDataset

        ref = ReferenceDataset(
            phase_entries=[("Na", 0.0), ("Cl", 0.0), ("NaCl", -1.0)]
        )
        s = Structure.from_parameters(
            [5, 5, 5], [90, 90, 90], [11, 17], np.array([[0, 0, 0], [0.5, 0.5, 0.5]])
        )
        flt = OptFilter(metrics=["stable"], relax=False, reference=ref)
        data, strucs, metrics = flt(["a", "b"], [s, s], energies=[-2.0, -1.0])
        assert len(strucs) == 1
        assert metrics["frac_stable"] == pytest.approx(0.5)
