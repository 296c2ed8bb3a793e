"""Phonon MLIP worker: constant-volume heat capacity at 300 K per structure.

Subprocess counterpart of /root/reference/rewards/calculators/fairchem/phonon.py
(quacc relax_job + phonon_flow + eSEN-30M-OAM MLIP). Usage:
    python phonon.py <in.extxyz> <out.txt> <n_workers>
NaN per structure on failure or when the MLIP stack is absent.
"""
from __future__ import annotations

import sys
from concurrent.futures import ProcessPoolExecutor


def phonon_task(atoms) -> float:
    try:
        import numpy as np
        from quacc.recipes.mlp.core import relax_job
        from quacc.recipes.mlp.phonons import phonon_flow

        params = dict(
            method="fairchem", name_or_path="esen-30m-oam", task_name="omat"
        )
        relaxed = relax_job(atoms, relax_cell=True, **params)
        flow = phonon_flow(
            relaxed["atoms"],
            job_params={"all": params},
            t_min=300.0, t_max=300.0, t_step=1.0,
        )
        tp = flow["results"]["thermal_properties"]
        idx = int(np.argmin(np.abs(np.array(tp["temperatures"]) - 300.0)))
        return float(tp["heat_capacity"][idx])
    except Exception:
        return float("nan")


def main() -> None:
    xyz_path, out_path, n_workers = sys.argv[1], sys.argv[2], int(sys.argv[3])

    from matinvent_tpu.chem.structure import read_extxyz

    structures = read_extxyz(xyz_path)
    try:
        from ase import Atoms

        atoms_list = [
            Atoms(numbers=s.species, scaled_positions=s.frac_coords % 1.0,
                  cell=s.lattice, pbc=True)
            for s in structures
        ]
        if n_workers > 1:
            with ProcessPoolExecutor(max_workers=n_workers) as pool:
                results = list(pool.map(phonon_task, atoms_list))
        else:
            results = [phonon_task(a) for a in atoms_list]
    except ImportError:
        results = [float("nan")] * len(structures)

    with open(out_path, "w") as fh:
        fh.write("\n".join(f"{v:.6f}" for v in results) + "\n")


if __name__ == "__main__":
    main()
