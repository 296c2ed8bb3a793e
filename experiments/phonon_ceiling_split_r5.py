"""Heat-capacity ceiling: measured sampling-vs-potential split (VERDICT r4
next #5).

The one BASELINE config whose threshold was unreachable offline is
heat_capacity (reward 0.8 <=> C_v >= 1.65 J/g/K; measured ceiling 0.7856 at
C_v 1.625, experiments/results/reward_ceilings.json). The verdict asks:
raise the native phonon ceiling above 0.8, or prove with a measured split
whether the pair potential or the k-sampling binds.

The native workflow (chem/phonon.gamma_heat_capacity) is ALREADY
mesh-sampled in the standard sense: the Γ-point of an (n1,n2,n3) supercell
samples the n1 x n2 x n3 Monkhorst-Pack grid of the primitive cell (band
folding) — finite-difference force constants over a supercell and "Γ-only"
of that supercell are the same physics. What is measurable is therefore:

1. sampling split — C_v vs supercell min_length (6/8/10/12 Å): the default
   8 Å either is or is not converged, and the residual is the sampling
   share of the threshold gap;
2. potential split — C_v vs a uniform frequency scale s (ω ∝ sqrt(depth),
   so s = sqrt(depth'/0.3) reprices the whole spectrum analytically from
   one Hessian): the sensitivity of C_v to the potential's stiffness
   calibration, i.e. the share owned by the pair potential;
3. the Dulong-Petit bound for the same composition (absolute ceiling any
   harmonic model can approach at 300 K);
4. context — the same workflow on rocksalt LiH: the policy's type
   vocabulary includes hydrides even though the corpus generator's anion
   pool does not, and light-element cells show what the PROXY can reach
   for policy-reachable compositions outside the measured design space.

Reference counterpart: /root/reference/rewards/calculators/fairchem/
phonon.py:22-55 (quacc phonon_flow -> C_v at 300 K with a trained MLIP).

JAX on CPU (host-side scoring; never touches the chip):
    python experiments/phonon_ceiling_split_r5.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from matinvent_tpu.chem.data import ATOMIC_WEIGHTS, SYMBOLS, Z_BY_SYMBOL
from matinvent_tpu.chem.phonon import (
    _MASSES_AMU,
    _equilibrate,
    choose_reps,
    gamma_frequencies,
    harmonic_heat_capacity,
    supercell,
)
from matinvent_tpu.chem.structure import Structure

KB_3R_PER_G = 24.943  # J/(mol K) -> /g via mean mass: Dulong-Petit 3R

# the measured ceiling design (reward_ceilings.json best_valid_design) and
# the hydride context cells
DESIGNS = {
    "Li2N_antifluorite": Structure.from_parameters(
        [3.582] * 3, [90.0] * 3,
        [Z_BY_SYMBOL["Li"]] * 2 + [Z_BY_SYMBOL["N"]],
        np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75], [0.0, 0.0, 0.0]]),
    ),
    "LiH_rocksalt": Structure.from_parameters(
        [2.04 * 2.0] * 3, [90.0] * 3,
        [Z_BY_SYMBOL["Li"], Z_BY_SYMBOL["H"]],
        np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    ),
    "BeH2_fluorite": Structure.from_parameters(
        [1.27 * 2.0] * 3, [90.0] * 3,
        [Z_BY_SYMBOL["Be"], Z_BY_SYMBOL["H"], Z_BY_SYMBOL["H"]],
        np.array([[0.0, 0.0, 0.0], [0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
    ),
}

REWARD_MIN, REWARD_MAX, THRESHOLD = 0.25, 2.00, 0.8


def reward_of(cv: float) -> float:
    return float(np.clip((cv - REWARD_MIN) / (REWARD_MAX - REWARD_MIN), 0, 1))


def cv_at(structure, min_length, max_atoms, freq_scale=1.0, temperature=300.0):
    s = _equilibrate([structure], None)[0]
    sc = supercell(s, choose_reps(s, min_length, max_atoms))
    omega = np.abs(gamma_frequencies(sc)) * freq_scale
    mass = float(np.sum(_MASSES_AMU[np.asarray(sc.species)]))
    return harmonic_heat_capacity(omega, mass, temperature), sc.num_atoms


def main():
    out = {"threshold_cv": REWARD_MIN + THRESHOLD * (REWARD_MAX - REWARD_MIN)}
    for name, s in DESIGNS.items():
        entry = {}
        masses = [ATOMIC_WEIGHTS[SYMBOLS[z]] for z in s.species]
        entry["dulong_petit_cv"] = round(KB_3R_PER_G / float(np.mean(masses)), 4)

        # 1. sampling split: supercell convergence at the shipped potential
        conv = {}
        for ml, cap in ((6.0, 80), (8.0, 160), (10.0, 300), (12.0, 480)):
            t0 = time.time()
            cv, n = cv_at(s, ml, cap)
            conv[f"min_length_{ml:g}"] = dict(
                cv=round(cv, 4), reward=round(reward_of(cv), 4),
                supercell_atoms=n, seconds=round(time.time() - t0, 1),
            )
            print(name, ml, "->", conv[f"min_length_{ml:g}"], flush=True)
        entry["supercell_convergence"] = conv

        # 2. potential split: uniform frequency rescale on the largest cell
        #    (ω ∝ sqrt(depth): s=0.707 <=> depth 0.15 eV, s=0.5 <=> 0.075)
        pot = {}
        for fs in (0.5, 0.707, 1.0, 1.414):
            cv, _ = cv_at(s, 10.0, 300, freq_scale=fs)
            pot[f"freq_scale_{fs:g}"] = dict(
                cv=round(cv, 4), reward=round(reward_of(cv), 4),
                depth_equiv_eV=round(0.3 * fs * fs, 4),
            )
        entry["potential_split"] = pot
        out[name] = entry

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "phonon_ceiling_split_r5.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
