"""Elastic-tensor MLIP worker: bulk modulus per structure.

Subprocess counterpart of /root/reference/rewards/calculators/fairchem/elastic.py
(quacc ``elastic_tensor_flow`` + eSEN-30M-OAM MLIP). Usage:
    python elastic.py <in.extxyz> <out.txt> <n_workers>
Writes one bulk modulus (GPa) per structure; NaN per structure on failure or
when the MLIP stack is not installed in this interpreter.
"""
from __future__ import annotations

import sys
from concurrent.futures import ProcessPoolExecutor


def bulk_task(atoms) -> float:
    try:
        from quacc.recipes.mlp.elastic import elastic_tensor_flow

        result = elastic_tensor_flow(
            atoms,
            job_params={
                "all": dict(
                    method="fairchem",
                    name_or_path="esen-30m-oam",
                    task_name="omat",
                ),
            },
        )
        return float(result["elasticity_doc"].bulk_modulus.voigt)
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
                results = list(pool.map(bulk_task, atoms_list))
        else:
            results = [bulk_task(a) for a in atoms_list]
    except ImportError:
        results = [float("nan")] * len(structures)

    with open(out_path, "w") as fh:
        fh.write("\n".join(f"{v:.6f}" for v in results) + "\n")


if __name__ == "__main__":
    main()
