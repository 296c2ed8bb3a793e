"""Type-temperature sweep on the r4 pretrain (VERDICT r4 next #2).

Every prescribed train-side validity lever measured as a loss this round
(validity_fix_r5.json: warm-start continuations 0.55-0.61, 3x-corpus
scratch uniform 0.607, absorbing 0.533, baseline 0.648), so this measures
the sampler-side generation-quality knob instead: D3PM ancestral type
draws at temperature tau (MatterGenConfig.type_temperature; tau=1 is the
exact posterior = reference semantics). Sharpening each draw toward the
posterior mode should convert the near-miss charge-imbalanced
compositions the diagnosis found (validity_diagnosis_r5.json: 29% of
generations fail ONLY smact, mostly off-by-one substitutions) into
balanced ones, at some diversity cost — both sides are measured here:
validity legs + distinct-composition fraction per tau at n=512.

    python experiments/type_temperature_ab_r5.py [taus=1.0,0.8,0.7,0.6,0.5]
        [ckpt=...] [sample_n=512]

The adopted tau (if any) is then re-evaluated through the FULL gen_eval
pipeline (relax + SUN) so the uniqueness cost is reported with the real
structure matcher, not the composition proxy.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "experiments", "results")
    ckpt = os.path.abspath(
        kv.get("ckpt", os.path.join(out_dir, "pretrained_geneval_r4"))
    )
    corpus = os.path.abspath(
        kv.get("corpus", os.path.join(repo, "experiments", "data", "corpus_r4.extxyz"))
    )
    taus = [float(t) for t in kv.get("taus", "1.0,0.8,0.7,0.6,0.5").split(",")]
    sample_n = int(kv.get("sample_n", 512))
    seed = int(kv.get("seed", 7))

    from matinvent_tpu.chem.structure import read_extxyz
    from matinvent_tpu.chem.validity import (
        cell_size_ok,
        smact_valid,
        structure_validity,
    )
    from matinvent_tpu.models.mattergen.sample import MatterGenSampler
    from matinvent_tpu.models.sample import (
        atom_dist_from_structures,
        register_atom_dist,
    )
    from matinvent_tpu.models.suite.mattergen import MatterGenSuite

    register_atom_dist(
        "corpus", atom_dist_from_structures(read_extxyz(corpus))
    )
    results = []
    for tau in taus:
        suite = MatterGenSuite(
            model_path=ckpt,
            config_overrides=dict(type_temperature=tau),
            sample_cfg={"max_atoms": 20},
        )
        diffusion, params = suite.load_model()
        sampler = MatterGenSampler(
            batch_size=sample_n, num_batches=1, max_atoms=20,
            num_atoms_distribution="corpus", size_buckets=4, seed=seed,
        )
        t0 = time.time()
        _, strucs = sampler.generate(model=(diffusion, params))
        dt = time.time() - t0

        n = len(strucs)
        c = {"smact_fail": 0, "structural_fail": 0, "cell_fail": 0, "all_ok": 0}
        comps = set()
        for s in strucs:
            ok_s, ok_g, ok_c = (
                smact_valid(s), structure_validity(s), cell_size_ok(s)
            )
            c["smact_fail"] += not ok_s
            c["structural_fail"] += not ok_g
            c["cell_fail"] += not ok_c
            c["all_ok"] += ok_s and ok_g and ok_c
            comps.add(s.composition.reduced_formula)
        entry = dict(
            tau=tau, n=n,
            **{k: round(v / n, 4) for k, v in c.items()},
            distinct_compositions=len(comps),
            frac_distinct_comps=round(len(comps) / n, 4),
            sample_seconds=round(dt, 1),
        )
        results.append(entry)
        print("[tau-ab] " + json.dumps(entry), flush=True)

    out = dict(
        ckpt=os.path.relpath(ckpt, out_dir), sample_n=sample_n,
        baseline_note=(
            "tau=1.0 is the exact D3PM posterior (reference semantics); "
            "train-side levers measured as losses in validity_fix_r5.json"
        ),
        sweep=results,
    )
    path = os.path.join(out_dir, "type_temperature_ab_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
