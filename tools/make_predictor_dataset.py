"""Generate a labeled structure dataset for predictor training.

Produces the training corpus for the reward-model predictors
(tools/train_predictor.py) from the analytic proxy-label models
(matinvent_tpu/chem/proxy_labels.py). The structure distribution is chosen to
cover what the RL sampler actually emits: plausible motif crystals, perturbed
variants, and outright random junk — the labels are analytic, so every
regime is exactly labeled and the predictor never extrapolates blind.

Usage:
    python tools/make_predictor_dataset.py out=<dir> [n=6000] [seed=0] \
        [max_atoms=16]

Writes <dir>/dataset.extxyz and <dir>/labels_<model_name>.txt for every
model in proxy_labels.LABEL_FNS.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from matinvent_tpu.chem.motifs import MOTIFS, anion_pool, cation_pool
from matinvent_tpu.chem.proxy_labels import LABEL_FNS, label_structures
from matinvent_tpu.chem.relax import _COVALENT_RADII
from matinvent_tpu.chem.structure import Structure, save_extxyz


def _element_pools():
    # wider anion set than the clean demo corpus: predictor training wants
    # coverage of the heavier chalcogenides/halides/pnictides too
    return cation_pool(), anion_pool(
        ("O", "S", "Se", "Te", "F", "Cl", "Br", "I", "N", "P", "As")
    )


def motif_structure(rng: np.random.Generator) -> Structure:
    cations, anions = _element_pools()
    name = list(MOTIFS)[rng.integers(len(MOTIFS))]
    coords, (n_cat, n_an) = MOTIFS[name]
    cat = int(rng.choice(cations))
    an = int(rng.choice(anions))
    species = [cat] * n_cat + [an] * n_an
    # occasionally a ternary: swap one cation site
    if n_cat >= 2 and rng.random() < 0.4:
        species[1] = int(rng.choice(cations))
    r = _COVALENT_RADII[cat] + _COVALENT_RADII[an]
    a = float(r * rng.uniform(1.5, 2.6))
    lengths = [a * rng.uniform(0.9, 1.15) for _ in range(3)]
    angles = [rng.uniform(80, 100) for _ in range(3)]
    jitter = rng.normal(0, rng.uniform(0.0, 0.04), coords.shape)
    return Structure.from_parameters(
        lengths, angles, species, (coords + jitter) % 1.0
    )


def random_structure(rng: np.random.Generator, max_atoms: int) -> Structure:
    """Junk regime: what an untrained/half-trained sampler emits."""
    n = int(rng.integers(1, max_atoms + 1))
    species = rng.integers(1, 84, n).tolist()
    lengths = rng.uniform(2.0, 14.0, 3).tolist()
    angles = rng.uniform(60.0, 120.0, 3).tolist()
    coords = rng.random((n, 3))
    return Structure.from_parameters(lengths, angles, species, coords)


def supercell_structure(rng: np.random.Generator, max_atoms: int) -> Structure:
    """2x1x1 supercell of a motif (more atoms, same chemistry)."""
    s = motif_structure(rng)
    if 2 * s.num_atoms > max_atoms:
        return s
    fc = np.concatenate([s.frac_coords * [0.5, 1, 1],
                         s.frac_coords * [0.5, 1, 1] + [0.5, 0, 0]])
    lat = s.lattice.copy()
    lat[0] *= 2.0
    return Structure(
        species=np.concatenate([s.species, s.species]),
        frac_coords=fc % 1.0,
        lattice=lat,
    )


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out_dir = kv.get("out", "predictor_data")
    n = int(kv.get("n", 6000))
    seed = int(kv.get("seed", 0))
    max_atoms = int(kv.get("max_atoms", 16))
    rng = np.random.default_rng(seed)

    structures = []
    for i in range(n):
        u = rng.random()
        if u < 0.55:
            structures.append(motif_structure(rng))
        elif u < 0.70:
            structures.append(supercell_structure(rng, max_atoms))
        else:
            structures.append(random_structure(rng, max_atoms))

    os.makedirs(out_dir, exist_ok=True)
    data_path = os.path.join(out_dir, "dataset.extxyz")
    save_extxyz(structures, data_path)
    print(f"wrote {len(structures)} structures -> {data_path}")
    for model_name in LABEL_FNS:
        labels = label_structures(structures, model_name)
        keep = np.isfinite(labels)
        labels[~keep] = 0.0  # degenerate zero-volume cells (rare)
        path = os.path.join(out_dir, f"labels_{model_name}.txt")
        np.savetxt(path, labels)
        print(
            f"{model_name}: mean={labels.mean():.3f} std={labels.std():.3f} "
            f"min={labels.min():.3f} max={labels.max():.3f} -> {path}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
