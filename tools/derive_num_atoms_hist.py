"""Derive a num-atoms histogram from an extxyz corpus.

The reference samples num-atoms from the ALEX_MP_20 empirical distribution
shipped inside the external mattergen wheel
(/root/reference/models/mattergen/sample.py:133). Offline, this tool derives
the same kind of table from any local corpus and emits it in the JSON format
``matinvent_tpu.models.mattergen.sample.load_num_atoms_distributions``
consumes ({name: {count: probability}}).

    python tools/derive_num_atoms_hist.py <corpus.extxyz> <name> [out.json]

The vendored "matinvent_corpus" table in models/mattergen/sample.py was
produced by running this on experiments/data/reference.extxyz (the largest
in-repo corpus, 2000 structures).
"""
from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def derive(corpus_path: str) -> dict[int, float]:
    from matinvent_tpu.chem.structure import read_extxyz

    structures = read_extxyz(corpus_path)
    if not structures:
        raise SystemExit(f"no structures in {corpus_path}")
    counts = collections.Counter(s.num_atoms for s in structures)
    total = sum(counts.values())
    return {int(k): v / total for k, v in sorted(counts.items())}


def main(argv: list[str]) -> None:
    if len(argv) < 2:
        raise SystemExit(__doc__)
    corpus, name = argv[0], argv[1]
    out_path = argv[2] if len(argv) > 2 else f"{name}_num_atoms.json"
    hist = derive(corpus)
    with open(out_path, "w") as fh:
        json.dump({name: {str(k): v for k, v in hist.items()}}, fh, indent=2)
        fh.write("\n")
    print(f"[derive_num_atoms_hist] {name}: {hist} -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
