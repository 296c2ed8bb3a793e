"""Elastic-tensor MLIP worker: bulk modulus per structure.

Subprocess counterpart of /root/reference/rewards/calculators/fairchem/elastic.py
(quacc ``elastic_tensor_flow`` + eSEN-30M-OAM MLIP). Usage:
    python elastic.py <in.extxyz> <out.txt> <n_workers>
Writes one bulk modulus (GPa) per structure. When the quacc/fairchem stack is
absent, falls back to the in-tree native E(V)-curvature workflow
(chem/phonon.soft_sphere_bulk_modulus; screening-grade soft-sphere potential
instead of the trained MLIP). NaN per structure on failure.
"""
from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor

# source-layout package: the pipeline chdirs into its results dir before
# spawning this worker, so the repo root must be pinned explicitly
sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), *[".."] * 4))
)
# each reward iteration spawns a fresh worker: persist compiled strain scans
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


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
        import quacc  # noqa: F401 — the real MLIP stack, reference parity
        from ase import Atoms

        atoms_list = [
            Atoms(numbers=s.species, scaled_positions=s.frac_coords % 1.0,
                  cell=s.lattice, pbc=True)
            for s in structures
        ]
        print("[mlip/elastic] backend: quacc MLIP (eSEN-30M-OAM)",
              file=sys.stderr)
        if n_workers > 1:
            with ProcessPoolExecutor(max_workers=n_workers) as pool:
                results = list(pool.map(bulk_task, atoms_list))
        else:
            results = [bulk_task(a) for a in atoms_list]
    except ImportError:
        # the fallback must announce itself: a misconfigured production env
        # (broken quacc install) would otherwise get screening-grade numbers
        # with no indication
        print("[mlip/elastic] backend: native soft-sphere E(V) fallback "
              "(quacc not importable; screening-grade)", file=sys.stderr)
        # native fallback: E(V) curvature on the in-tree pair potential
        # (chem/phonon.py) — keeps the bulk-modulus MLIP reward runnable
        # end to end with zero external dependencies
        try:
            import jax

            # host-side worker: never touch the TPU (remote compiles per
            # structure size take minutes and contend with the sampler)
            jax.config.update("jax_platforms", "cpu")
            from matinvent_tpu.chem.phonon import soft_sphere_bulk_modulus

            results = [float(v) for v in soft_sphere_bulk_modulus(structures)]
        except Exception:
            results = [float("nan")] * len(structures)

    with open(out_path, "w") as fh:
        fh.write("\n".join(f"{v:.6f}" for v in results) + "\n")


if __name__ == "__main__":
    main()
