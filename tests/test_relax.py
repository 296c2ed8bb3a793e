"""Batched device relaxer tests."""
import numpy as np
import pytest

from matinvent_tpu.chem.relax import SoftSphereRelaxer
from matinvent_tpu.chem.structure import Structure


def overlapping_pair():
    # two C atoms far too close (0.6 A) in a roomy box
    return Structure.from_parameters(
        [6, 6, 6], [90, 90, 90], [6, 6], np.array([[0.0, 0, 0], [0.1, 0, 0]])
    )


class TestSoftSphereRelaxer:
    def test_separates_overlapping_atoms(self):
        relaxer = SoftSphereRelaxer(steps=300, max_atoms=8)
        s = overlapping_pair()
        d0 = s.min_interatomic_distance()
        relaxed, energies = relaxer([s])
        d1 = relaxed[0].min_interatomic_distance()
        assert d1 > d0
        assert d1 > 1.2  # approaching ~2*r_cov(C) = 1.52
        assert np.isfinite(energies[0])

    def test_energy_decreases(self):
        relaxer = SoftSphereRelaxer(steps=0, max_atoms=8)
        s = overlapping_pair()
        _, e0 = relaxer([s])
        relaxer2 = SoftSphereRelaxer(steps=300, max_atoms=8)
        _, e1 = relaxer2([s])
        assert e1[0] < e0[0]

    def test_oversized_passthrough(self):
        relaxer = SoftSphereRelaxer(steps=10, max_atoms=2)
        big = Structure.from_parameters(
            [6, 6, 6], [90, 90, 90], [6, 6, 6],
            np.array([[0, 0, 0], [0.3, 0.3, 0.3], [0.6, 0.6, 0.6]]),
        )
        relaxed, energies = relaxer([big])
        assert np.isnan(energies[0])
        np.testing.assert_array_equal(relaxed[0].species, big.species)

    def test_as_mlip_opt_hook(self):
        """Signature compatibility with sample_cfg.mlip_opt (mat_invent.py:89-93)."""
        relaxer = SoftSphereRelaxer(steps=5, max_atoms=8)
        strucs, energies = relaxer([overlapping_pair()], "/tmp/unused.extxyz")
        assert len(strucs) == 1 and len(energies) == 1


def test_relaxer_with_optfilter_stability():
    """Full filter path: relax -> energies -> convex-hull stability mask."""
    from matinvent_tpu.pipeline.filters import OptFilter, ReferenceDataset

    ref = ReferenceDataset(phase_entries=[("C", 0.0)])
    flt = OptFilter(
        metrics=["stable"], relax=True,
        relaxer=SoftSphereRelaxer(steps=50, max_atoms=8),
        reference=ref, ehull_threshold=1000.0,  # generous: energies are model-scale
    )
    data, strucs, metrics = flt(["a"], [overlapping_pair()])
    assert "frac_stable" in metrics
