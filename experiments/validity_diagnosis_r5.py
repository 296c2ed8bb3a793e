"""Diagnose WHICH validity leg fails on the r4 pretrain's 1024 rich-corpus
generations (VERDICT r4 weak #3 / next #2).

The r4 gen_eval recorded frac_validity 0.646 but never attributed the
failures to a leg (reference legs: is_smact_valid charge balance vs
structure_validity vs the <25 A cell-edge check —
/root/reference/pipeline/filters/opt_filter.py:50-63). This script re-runs
each leg independently over the archived generations
(experiments/results/gen_eval_1024_r4/generated_crystals.extxyz) AND over
the pretrain corpus itself, so a corpus-level charge imbalance (the rich
corpus' 80-element ordered-derivative substitutions) is distinguishable
from a model-level failure.

Pure host-side numpy/chem — no JAX, safe on the 1-core CPU.
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matinvent_tpu.chem.structure import read_extxyz
from matinvent_tpu.chem.validity import (
    cell_size_ok,
    smact_valid,
    structure_validity,
)

GEN = "experiments/results/gen_eval_1024_r4/generated_crystals.extxyz"


def diagnose(structures, tag):
    legs = Counter()
    n = len(structures)
    fail_examples = {"smact": [], "structural": [], "cell": []}
    min_dists = []
    for s in structures:
        ok_smact = smact_valid(s)
        ok_struct = structure_validity(s)
        ok_cell = cell_size_ok(s)
        legs["smact_fail"] += not ok_smact
        legs["structural_fail"] += not ok_struct
        legs["cell_fail"] += not ok_cell
        legs["all_ok"] += ok_smact and ok_struct and ok_cell
        legs["only_smact_fail"] += (not ok_smact) and ok_struct and ok_cell
        legs["only_structural_fail"] += ok_smact and (not ok_struct) and ok_cell
        legs["only_cell_fail"] += ok_smact and ok_struct and (not ok_cell)
        if not ok_smact and len(fail_examples["smact"]) < 8:
            fail_examples["smact"].append(s.composition.reduced_formula)
        if not ok_struct:
            min_dists.append(float(s.min_interatomic_distance()))
            if len(fail_examples["structural"]) < 8:
                fail_examples["structural"].append(
                    dict(
                        formula=s.composition.reduced_formula,
                        min_dist=round(float(s.min_interatomic_distance()), 3),
                        volume=round(float(s.volume), 2),
                    )
                )
        if not ok_cell and len(fail_examples["cell"]) < 8:
            fail_examples["cell"].append(
                dict(
                    formula=s.composition.reduced_formula,
                    max_len=round(float(s.lengths.max()), 2),
                )
            )
    out = {
        "tag": tag,
        "n": n,
        "frac_valid": round(legs["all_ok"] / n, 4),
        "frac_smact_fail": round(legs["smact_fail"] / n, 4),
        "frac_structural_fail": round(legs["structural_fail"] / n, 4),
        "frac_cell_fail": round(legs["cell_fail"] / n, 4),
        "frac_only_smact_fail": round(legs["only_smact_fail"] / n, 4),
        "frac_only_structural_fail": round(legs["only_structural_fail"] / n, 4),
        "frac_only_cell_fail": round(legs["only_cell_fail"] / n, 4),
        "examples": fail_examples,
    }
    if min_dists:
        import numpy as np

        out["structural_fail_min_dist_percentiles"] = {
            "p10": round(float(np.percentile(min_dists, 10)), 3),
            "p50": round(float(np.percentile(min_dists, 50)), 3),
            "p90": round(float(np.percentile(min_dists, 90)), 3),
        }
    return out


def main():
    results = {}
    gens = read_extxyz(GEN)
    results["generated_r4"] = diagnose(gens, "generated_r4")

    # the pretrain corpus itself: is the 80-element substitution machinery
    # emitting charge-imbalanced compositions?
    corpus_paths = [
        "experiments/data/corpus_r4.extxyz",  # the 12k rich corpus (r4)
        "experiments/data/rich_corpus.extxyz",
    ]
    for p in corpus_paths:
        if os.path.exists(p):
            corpus = read_extxyz(p)
            if len(corpus) > 3000:
                import random

                random.seed(0)
                corpus = random.sample(corpus, 3000)
            results["pretrain_corpus"] = diagnose(corpus, os.path.basename(p))
            break
    else:
        found = None
        data_dir = "experiments/data"
        if os.path.isdir(data_dir):
            for f in sorted(os.listdir(data_dir)):
                if "rich" in f and f.endswith((".extxyz", ".xyz")):
                    found = os.path.join(data_dir, f)
                    break
        if found:
            corpus = read_extxyz(found)
            if len(corpus) > 3000:
                import random

                random.seed(0)
                corpus = random.sample(corpus, 3000)
            results["pretrain_corpus"] = diagnose(corpus, os.path.basename(found))
        else:
            results["pretrain_corpus"] = {"error": "corpus file not found"}

    out_path = "experiments/results/validity_diagnosis_r5.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
