"""Build the gen_eval reference-dataset artifact: structures + hull energies.

The reference evaluates SUN ratio against the LMDB reference dataset that
ships with the external mattergen package (opt_filter.py:89-95: known
structures for novelty, known phase energies for the stability hull). This
environment has no network, so the framework ships its own artifact built
from the same corpus generator the demo models pretrain on, labeled with the
analytic formation-energy model (chem/proxy_labels) that also trains the
shipped e_form predictor — one consistent energy scale for the hull, the
generated samples, and the ML reward.

Writes:
    <out>/reference.extxyz          novelty structures
    <out>/reference_energies.json   formula -> formation energy (eV/atom):
                                    per-formula minimum over the corpus,
                                    plus 0.0 elemental endpoints

    python tools/make_reference_dataset.py out=experiments/data [n=2000]

``rich=1`` switches the generator to the full motif x supercell x element x
distortion design space (chem/motifs.make_rich_structure, 2-20 atom cells,
ordered-derivative substitutions, anisotropic cells) — the non-toy corpus of
VERDICT r3 #5; ``max_atoms=`` bounds the cell size, ``name=`` the output
file stem (default ``reference``).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from matinvent_tpu.chem.proxy_labels import formation_energy_ev_per_atom
from matinvent_tpu.chem.structure import save_extxyz


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out_dir = kv.get("out", "experiments/data")
    n = int(kv.get("n", 2000))
    seed = int(kv.get("seed", 0))
    rich = kv.get("rich", "0") not in ("0", "false", "")
    max_atoms = int(kv.get("max_atoms", 20))
    name = kv.get("name", "reference")
    os.makedirs(out_dir, exist_ok=True)

    # the demo corpus generator (plausible ionic motif crystals)
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rl_demo", os.path.join(repo, "experiments", "rl_demo.py")
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    # oversample, then keep the validity-passing subset: the reference
    # dataset (like MP itself) contains only chemically sensible entries, and
    # models pretrained on it inherit that validity rate
    from matinvent_tpu.chem.structure import read_extxyz
    from matinvent_tpu.pipeline.filters import invalid_filter

    xyz_path = os.path.join(out_dir, f"{name}.extxyz")
    tmp_path = xyz_path + ".raw"
    structures: list = []
    tries = 0
    while len(structures) < n and tries < 6:
        if rich:
            from matinvent_tpu.chem.motifs import make_rich_structure

            rng = np.random.default_rng(seed + tries)
            cand = [
                make_rich_structure(rng, max_atoms=max_atoms)
                for _ in range(2 * n)
            ]
        else:
            demo.make_dataset(tmp_path, n=2 * n, seed=seed + tries)
            cand = read_extxyz(tmp_path)
        mask = invalid_filter(cand, cand, return_mask=True)
        structures.extend([s for s, m in zip(cand, mask) if m])
        tries += 1
    if os.path.exists(tmp_path):
        os.remove(tmp_path)
    structures = structures[:n]
    save_extxyz(structures, xyz_path)

    energies: dict[str, float] = {}
    elements: set[str] = set()
    for s in structures:
        ef = formation_energy_ev_per_atom(s)
        if not np.isfinite(ef):
            continue
        f = s.composition.reduced_formula
        energies[f] = min(energies.get(f, np.inf), float(ef))
        elements.update(s.composition.elements)
    # elemental endpoints: formation energy 0 by definition
    for el in sorted(elements):
        energies.setdefault(el, 0.0)

    json_path = os.path.join(out_dir, f"{name}_energies.json")
    with open(json_path, "w") as fh:
        json.dump(energies, fh, indent=1, sort_keys=True)
    print(
        f"wrote {len(structures)} structures -> {xyz_path}\n"
        f"wrote {len(energies)} phase energies ({len(elements)} elements) "
        f"-> {json_path}"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
