"""Offline large-batch generation + SUN-ratio evaluation.

Capability parity with /root/reference/scripts/gen_eval.sh:13-30
(mattergen-generate + mattergen-evaluate): draw batch_size x num_batches
structures from a checkpoint, save extxyz, evaluate validity/unique/novel/
stable fractions (optionally after MLIP relaxation via a pluggable relaxer)
and write metrics.json.

Usage:
    python gen_eval.py model=diffcsp model.model_path=exp_res/run/models/final \
        output_dir=gen_out batch_size=32 num_batches=32 \
        [reference_path=...] [reference_energies=...] [relax=true]

Stability/SUN: when ``reference_energies`` (formula -> formation energy
eV/atom, tools/make_reference_dataset.py) is given, generated structures are
optionally SoftSphere-relaxed, scored with the same analytic formation-energy
model that built the hull (chem/proxy_labels — one consistent energy scale),
and frac_stable / frac_sun are reported alongside validity/unique/novel.
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

from matinvent_tpu.pipeline.logger import setup_logging
from matinvent_tpu.utils.config import instantiate, load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def main(argv: list[str]) -> None:
    setup_logging()
    kv = dict(a.split("=", 1) for a in argv if "=" in a and not a.startswith("model"))
    output_dir = kv.pop("output_dir", "gen_out")
    batch_size = int(kv.pop("batch_size", 32))
    num_batches = int(kv.pop("num_batches", 32))
    reference_path = kv.pop("reference_path", None)
    reference_energies = kv.pop("reference_energies", None)
    relax = kv.pop("relax", "false").lower() in ("1", "true", "yes")
    # sample num-atoms from a corpus' empirical histogram (typically the
    # model's own pretrain set) instead of a named table — avoids asking the
    # model for cell sizes it never saw
    num_atoms_from = kv.pop("num_atoms_from", None)
    # matching tier(s) for unique/novel metrics; "disordered" mirrors the
    # reference's gen_eval default (scripts/gen_eval.sh:27). A comma list
    # (e.g. "disordered,ordered") evaluates every tier on the same relaxed
    # structures — the first is the headline, the rest land in by_matcher.
    structure_matcher = kv.pop("structure_matcher", "disordered")
    matcher_tiers = [m.strip() for m in structure_matcher.split(",") if m.strip()]
    if kv:
        raise ValueError(f"unknown arguments: {sorted(kv)}")

    model_overrides = [a for a in argv if a.startswith("model")]
    cfg = load_config(CONFIG_DIR, "base", overrides=model_overrides)
    os.makedirs(output_dir, exist_ok=True)

    suite = instantiate(cfg["model"])
    diffusion, params = suite.load_model()
    sampler = suite.get_sampler()
    if num_atoms_from:
        from matinvent_tpu.chem.structure import read_extxyz
        from matinvent_tpu.models.sample import (
            atom_dist_from_structures,
            register_atom_dist,
        )

        register_atom_dist(
            "corpus", atom_dist_from_structures(read_extxyz(num_atoms_from))
        )
        sampler.num_atoms_distribution = "corpus"

    logging.info(f"generating {batch_size * num_batches} structures ...")
    from matinvent_tpu.models.sample import batch_to_structures

    # warmup launch: exclude one-time XLA compilation from the throughput
    # statistic (generation_time_s reports steady-state sampling, like
    # bench.py; the first-ever invocation pays ~2-3 min of AOT compile)
    import jax

    warm = sampler.launch(model=(diffusion, params), batch_size=batch_size,
                          num_batches=1)
    jax.block_until_ready(warm.frac_coords)

    t0 = time.perf_counter()
    all_data, all_strucs = [], []
    # pipelined: device samples batch i+1 while the host converts batch i
    pending = sampler.launch(
        model=(diffusion, params), batch_size=batch_size, num_batches=1
    )
    for i in range(num_batches):
        current = pending
        if i + 1 < num_batches:
            pending = sampler.launch(
                model=(diffusion, params), batch_size=batch_size, num_batches=1
            )
        data, strucs = batch_to_structures(current)
        all_data.extend(data)
        all_strucs.extend(strucs)
    gen_time = time.perf_counter() - t0
    logging.info(
        f"generated {len(all_strucs)} structures in {gen_time:.1f}s "
        f"({len(all_strucs) / gen_time:.2f} structures/sec)"
    )

    from matinvent_tpu.pipeline.save import save_structures

    xyz_path = save_structures(all_strucs, output_dir, "generated_crystals.extxyz")
    logging.info(f"saved {xyz_path}")

    # SUN-style evaluation
    from matinvent_tpu.pipeline.filters import OptEval, ReferenceDataset

    reference = ReferenceDataset.from_files(reference_path, reference_energies)

    if relax:
        # relaxation is independent of stability scoring: metrics are
        # reported on the relaxed structures either way (reference:
        # mattergen-evaluate --relax, scripts/gen_eval.sh:27)
        from matinvent_tpu.chem.relax import SoftSphereRelaxer

        logging.info("relaxing generated structures (SoftSphere) ...")
        all_strucs, _ = SoftSphereRelaxer()(all_strucs)

    energies = None
    if reference.hull is not None:
        # energies on the hull's own scale: the analytic formation-energy
        # model x num_atoms (stable_mask takes totals)
        import numpy as np

        from matinvent_tpu.chem.proxy_labels import formation_energy_ev_per_atom

        energies = [
            formation_energy_ev_per_atom(s) * s.num_atoms for s in all_strucs
        ]
        energies = [e if np.isfinite(e) else None for e in energies]

    by_matcher = {}
    for tier in matcher_tiers:
        evaluator = OptEval(
            relax=False, reference=reference, structure_matcher=tier
        )
        tier_metrics, _ = evaluator(all_strucs, energies=energies)
        by_matcher[tier] = tier_metrics
        logging.info(f"matcher={tier}: {json.dumps(tier_metrics)}")
    metrics = dict(by_matcher[matcher_tiers[0]])
    metrics.update(
        num_generated=len(all_strucs),
        generation_time_s=round(gen_time, 2),
        structures_per_sec=round(len(all_strucs) / gen_time, 3),
        structure_matcher=matcher_tiers[0],
    )
    if len(matcher_tiers) > 1:
        metrics["by_matcher"] = by_matcher
    out_json = os.path.join(output_dir, "metrics.json")
    with open(out_json, "w") as fh:
        json.dump(metrics, fh, indent=2)
        fh.write("\n")
    logging.info(f"metrics: {json.dumps(metrics)}")


if __name__ == "__main__":
    main(sys.argv[1:])
