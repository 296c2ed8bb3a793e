"""Native phonon / elastic screening workflows (chem/phonon.py).

Capability parity target: /root/reference/rewards/calculators/fairchem/
phonon.py:22-55 (heat capacity at 300 K) and elastic.py:12-28 (bulk
modulus), which this framework also reaches without the external MLIP stack.
"""
from __future__ import annotations

import numpy as np
import pytest

from matinvent_tpu.chem.phonon import (
    _MASSES_AMU,
    choose_reps,
    gamma_frequencies,
    gamma_heat_capacity,
    harmonic_heat_capacity,
    soft_sphere_bulk_modulus,
    supercell,
)
from matinvent_tpu.chem.structure import Structure

_KB = 1.380649e-23
_AMU_G = 1.66053906660e-24


def rocksalt(a: float, cat: int, an: int) -> Structure:
    return Structure.from_parameters(
        [a] * 3, [90] * 3, [cat, an],
        np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    )


def test_supercell_replication():
    s = rocksalt(4.0, 3, 9)
    sc = supercell(s, (2, 1, 3))
    assert sc.num_atoms == 2 * 6
    np.testing.assert_allclose(sc.lattice[0], s.lattice[0] * 2)
    np.testing.assert_allclose(sc.lattice[2], s.lattice[2] * 3)
    # frac coords of the first replica are the originals compressed by reps
    np.testing.assert_allclose(
        sc.frac_coords[:2] * np.array([2, 1, 3]), s.frac_coords, atol=1e-12
    )


def test_choose_reps_budget():
    s = rocksalt(4.0, 3, 9)
    reps = choose_reps(s, min_length=8.0, max_atoms=160)
    assert s.num_atoms * np.prod(reps) <= 160
    assert min(reps) >= 2  # 4 Å axes must be doubled toward 8 Å
    reps_tight = choose_reps(s, min_length=8.0, max_atoms=10)
    assert s.num_atoms * np.prod(reps_tight) <= 10
    assert choose_reps(s, min_length=8.0, max_atoms=3) == (1, 1, 1)


def test_gamma_frequencies_acoustic_modes():
    """Γ-point spectrum has exactly 3 (near-)zero acoustic translations."""
    s = rocksalt(3.8, 11, 17)
    w = gamma_frequencies(supercell(s, (2, 2, 2)))
    assert w.shape == (3 * 16,)
    # the three smallest |ω| are the acoustic translations
    idx = np.argsort(np.abs(w))
    assert np.all(np.abs(w[idx[:3]]) < 1e10)


def test_dulong_petit_limit():
    """Low frequencies at 300 K => classical limit C_v -> N_modes * k_B."""
    omega = np.full(30, 1e12)  # ~0.16 THz, x = ħω/kT ≈ 0.025
    mass_amu = 100.0
    cv = harmonic_heat_capacity(omega, mass_amu)
    expected = 30 * _KB / (mass_amu * _AMU_G)
    assert cv == pytest.approx(expected, rel=0.01)


def test_heat_capacity_ranks_and_magnitudes():
    """Light lattices have higher C_v per gram; magnitudes land in the
    physical band (real LiF ≈ 1.6, PbS ≈ 0.2 J/g/K)."""
    lif = rocksalt(4.0, 3, 9)
    pbs = rocksalt(5.9, 82, 16)
    cv = gamma_heat_capacity([lif, pbs], max_atoms=70, min_length=6.0)
    assert np.all(np.isfinite(cv))
    assert cv[0] > cv[1] > 0
    assert 0.5 < cv[0] < 3.0
    assert 0.05 < cv[1] < 0.6


def test_bulk_modulus_positive_and_ordered():
    """E(V) curvature at the equilibrated scale is positive; short stiff
    bonds (C-C) beat soft heavy lattices (CsI)."""
    c = rocksalt(3.6, 6, 6)
    csi = rocksalt(5.0, 55, 53)
    b = soft_sphere_bulk_modulus([c, csi])
    assert np.all(np.isfinite(b)) and np.all(b > 0)
    assert b[0] > b[1]


def test_mass_table_matches_structure_density():
    s = rocksalt(4.0, 3, 9)
    mass = float(np.sum(_MASSES_AMU[np.asarray(s.species)]))
    dens = mass * _AMU_G / (s.volume * 1e-24)
    assert dens == pytest.approx(s.density, rel=1e-3)
