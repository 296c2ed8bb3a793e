"""Weak scaling of the dp paths on the virtual mesh (VERDICT r3 #9).

With a fixed per-device batch on the 1-core host, ideal weak scaling is
wall(n) = n * wall(1); overhead above ~1 exposes hidden per-step host syncs
or resharding inside the scans. The full-size artifact lives at
experiments/results/weak_scaling_r4.json (experiments/weak_scaling_r4.py);
this test re-measures at reduced shapes and asserts the dp sample scan and
the MatterGen DDPO update stay under 1.3x overhead from 1 -> 8 devices.
"""
import importlib.util
import os

import pytest


def _load_harness():
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(
        os.path.dirname(here), "experiments", "weak_scaling_r4.py"
    )
    spec = importlib.util.spec_from_file_location("weak_scaling_r4", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_dp_weak_scaling_overhead_under_1p3():
    mod = _load_harness()
    # Bound the MAX overhead over every measured mesh size, not just n=8 —
    # a hidden sync that happens to amortize at n=8 would still show at
    # n=2/4. The bound is generous because timing on a shared 1-core CI
    # host is noisy, but a hidden per-step reshard/host-sync shows up as
    # 2-10x, not 1.3x. Sub-1.0 overheads are expected and benign: the
    # 1-device baseline carries per-dispatch fixed cost that larger meshes
    # amortize over n* the work (see the artifact note). One remeasure on
    # failure: a concurrent chip compile or matcher pass on this 1-core
    # host inflates a single wall-clock sample well past 1.3x (observed
    # 1.48x under a 3-job load); a genuine resharding bug reproduces.
    for attempt in range(2):
        res = mod.measure(
            device_counts=(1, 2, 4, 8), per_dev_batch=8, max_atoms=6,
            timesteps=24, hidden=32, layers=1, ddpo_timesteps=8, repeats=2,
        )
        worst = {
            kind: max(res[kind], key=lambda n: res[kind][n])
            for kind in ("sample_overhead", "ddpo_overhead")
        }
        if all(res[k][n] < 1.3 for k, n in worst.items()):
            return
    for kind, worst_n in worst.items():
        assert res[kind][worst_n] < 1.3, (
            f"{kind} worst at n={worst_n} (reproduced on remeasure): "
            f"{ {n: round(v, 3) for n, v in res[kind].items()} } "
            f"(walls: sample_s={res['sample_s']} ddpo_s={res['ddpo_s']})"
        )
