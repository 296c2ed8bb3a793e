"""Mocked-network rehearsal of tools/first_networked_run.py (VERDICT r4 #6).

The first-networked-run script is the one chance to close the
published-checkpoint gap (reference premise:
/root/reference/models/suite/mattergen.py:54-92 +
/root/reference/rewards/calculators/alignn/prediction.py:209-301) and until
this rehearsal it was untested code. Here every network touchpoint is mocked
with on-disk stand-ins:

* ``huggingface_hub.snapshot_download`` -> a fake HF snapshot directory in
  the real ``prop_pred/alignn/<task>/`` layout (checkpoints built by the
  same fixture generators test_alignn_native.py validates the loader with);
* ``huggingface_hub.hf_hub_download`` -> a fake GemNet-style ``last.ckpt``
  container whose state-dict keys trip ``detect_gemnet``;
* the external ``mattergen`` wheel + ``hydra`` -> a miniature stand-in
  package written to disk and put on PYTHONPATH, so
  ``_builder_mattergen_wheel`` (never executed before r5) actually runs its
  hydra-instantiate + state-dict-load + ChemGraph/collate adapter path;
* the DGL ``alignn``/``jarvis`` reference stack -> stub modules.

All four stages run end to end at CI scale, idempotence is exercised
(second invocation skips), the alex_table artifact is fed through the REAL
``num_atoms_distribution_file`` consumer, and the failure messages fire
without the mocks. The downloads themselves and the published weights remain
the only networked-run-only residue.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest


def _load_module(rel_path: str, name: str):
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(os.path.dirname(here), *rel_path.split("/"))
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------ fake wheel

_FAKE_WHEEL_FILES = {
    "hydra/__init__.py": "",
    "hydra/utils.py": """\
import importlib


def instantiate(cfg):
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    mod, cls = target.rsplit(".", 1)
    return getattr(importlib.import_module(mod), cls)(**cfg)
""",
    "mattergen/__init__.py": "",
    "mattergen/common/__init__.py": "",
    "mattergen/common/data/__init__.py": "",
    "mattergen/common/data/chemgraph.py": """\
class ChemGraph:
    def __init__(self, atomic_numbers, pos, cell, num_atoms):
        self.atomic_numbers = atomic_numbers
        self.pos = pos
        self.cell = cell
        self.num_atoms = num_atoms
""",
    "mattergen/common/data/collate.py": """\
import torch


class _Batch:
    pass


def collate(graphs):
    b = _Batch()
    b.pos = torch.cat([g.pos for g in graphs])
    b.atomic_numbers = torch.cat([g.atomic_numbers for g in graphs])
    b.cell = torch.cat([g.cell for g in graphs])
    b.num_atoms = torch.cat([g.num_atoms for g in graphs])
    b.batch = torch.repeat_interleave(
        torch.arange(len(graphs)), b.num_atoms
    )
    return b
""",
    "mattergen/common/data/num_atoms_distribution.py": """\
# stand-in table in the wheel's {count: probability} format; the real one
# ships only in the external mattergen wheel (ALEX_MP_20 stays strictly
# user-supplied)
NUM_ATOMS_DISTRIBUTIONS = {
    "ALEX_MP_20": {2: 0.2, 4: 0.5, 6: 0.3},
    "mp_20_stub": {1: 0.5, 2: 0.5},
}
""",
    "mattergen/fake_teacher.py": """\
import torch


class TinyGemNet(torch.nn.Module):
    # key names deliberately contain the GemNet markers detect_gemnet
    # keys on ("gemnet", "atom_emb")
    def __init__(self, hidden=16, vocab=100):
        super().__init__()
        self.gemnet_atom_emb = torch.nn.Embedding(vocab + 2, hidden)
        self.mlp_rbf = torch.nn.Linear(hidden + 7, hidden)
        self.out_pos = torch.nn.Linear(hidden, 3)
        self.out_type = torch.nn.Linear(hidden, vocab)
        self.out_cell = torch.nn.Linear(hidden, 9)

    def forward(self, batch, t):
        emb = self.gemnet_atom_emb(batch.atomic_numbers)
        tt = t[batch.batch][:, None].float()
        diag = torch.diagonal(batch.cell, dim1=-2, dim2=-1)[batch.batch]
        h = torch.nn.functional.silu(
            self.mlp_rbf(torch.cat([emb, batch.pos.float(), tt, diag], -1))
        )
        nb = batch.cell.shape[0]
        hg = torch.zeros(nb, h.shape[-1])
        hg.index_add_(0, batch.batch, h)
        hg = hg / batch.num_atoms[:, None].clamp(min=1).float()

        class _Out:
            pass

        out = _Out()
        out.pos = self.out_pos(h)
        out.atomic_numbers = self.out_type(h)
        out.cell = self.out_cell(hg).reshape(nb, 3, 3)
        return out


class FakeDiffusionModule(torch.nn.Module):
    def __init__(self, hidden=16, vocab=100):
        super().__init__()
        self.model = TinyGemNet(hidden=hidden, vocab=vocab)


class FakeLightning:
    def __init__(self, hidden=16, vocab=100):
        self.diffusion_module = FakeDiffusionModule(hidden=hidden, vocab=vocab)
""",
}


@pytest.fixture
def fakewheel(tmp_path, monkeypatch):
    root = tmp_path / "fakewheel"
    for rel, src in _FAKE_WHEEL_FILES.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(src)
    before = set(sys.modules)
    monkeypatch.syspath_prepend(str(root))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv(
        "PYTHONPATH",
        str(root) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    monkeypatch.chdir(repo)
    yield str(root)
    # drop the fake packages so later tests see the real (absent) wheel
    for name in [n for n in sys.modules if n not in before
                 and (n.startswith("mattergen") or n.startswith("hydra"))]:
        del sys.modules[name]


def _fake_hf_snapshot(root: str) -> str:
    """Fake jwchen25/MatInvent snapshot: prop_pred/alignn/<prop>/ with
    checkpoints in the exact format the loader tests validate."""
    tan = _load_module("tests/test_alignn_native.py", "_tan_fixtures")
    import torch

    rng = np.random.default_rng(11)
    for prop in ("band_gap", "formation_energy", "bulk_modulus_voigt"):
        d = os.path.join(root, "prop_pred", "alignn", prop)
        os.makedirs(d, exist_ok=True)
        sd = tan._make_state_dict(rng)
        torch.save(
            {k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
            os.path.join(d, "best_model.pt"),
        )
        with open(os.path.join(d, "config.json"), "w") as fh:
            json.dump({"model": tan._model_config()}, fh)
        tan._atom_init(os.path.join(d, "atom_init.json"), rng)
    return root


def _fake_dgl_stack(monkeypatch) -> None:
    alignn = types.ModuleType("alignn")
    pretrained = types.ModuleType("alignn.pretrained")
    pretrained.get_prediction = lambda model_name, atoms: [0.5]
    alignn.pretrained = pretrained
    jarvis = types.ModuleType("jarvis")
    core = types.ModuleType("jarvis.core")
    atoms_mod = types.ModuleType("jarvis.core.atoms")

    class Atoms:
        def __init__(self, lattice_mat, elements, coords, cartesian):
            assert all(isinstance(e, str) for e in elements), elements

    atoms_mod.Atoms = Atoms
    core.atoms = atoms_mod
    jarvis.core = core
    for name, mod in [("alignn", alignn), ("alignn.pretrained", pretrained),
                      ("jarvis", jarvis), ("jarvis.core", core),
                      ("jarvis.core.atoms", atoms_mod)]:
        monkeypatch.setitem(sys.modules, name, mod)


def _tiny_corpus(path: str, n: int = 32) -> str:
    from matinvent_tpu.chem.structure import Structure, save_extxyz

    rng = np.random.default_rng(3)
    strucs = []
    for _ in range(n):
        na = int(rng.integers(4, 7))
        strucs.append(Structure(
            np.eye(3) * (3.5 + rng.random()),
            rng.integers(1, 80, na),
            rng.random((na, 3)),
        ))
    save_extxyz(strucs, path)
    return path


def _fake_gemnet_ckpt(path: str) -> str:
    import torch
    from mattergen.fake_teacher import FakeLightning  # fakewheel on sys.path

    lm = FakeLightning(hidden=16, vocab=100)
    sd = {
        "diffusion_module." + k: v
        for k, v in lm.diffusion_module.state_dict().items()
    }
    torch.save(
        {
            "state_dict": sd,
            "config": {
                "lightning_module": {
                    "_target_": "mattergen.fake_teacher.FakeLightning",
                    "hidden": 16,
                    "vocab": 100,
                },
            },
        },
        path,
    )
    return path


@pytest.mark.slow
def test_all_four_stages_end_to_end(tmp_path, monkeypatch, capsys, fakewheel):
    fnr = _load_module("tools/first_networked_run.py", "_fnr")
    monkeypatch.setattr(fnr, "OUT", str(tmp_path / "fnr"))

    snap = _fake_hf_snapshot(str(tmp_path / "hf_snapshot"))
    teacher = _fake_gemnet_ckpt(str(tmp_path / "last.ckpt"))
    corpus = _tiny_corpus(str(tmp_path / "corpus.extxyz"))

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub, "snapshot_download",
        lambda repo, allow_patterns=None: snap,
    )
    monkeypatch.setattr(
        huggingface_hub, "hf_hub_download", lambda repo, fn: teacher
    )
    _fake_dgl_stack(monkeypatch)

    # ---- stage alex_table: extraction format feeds the REAL consumer
    fnr.stage_alex_table({})
    table_path = os.path.join(fnr.OUT, "num_atoms_distributions.json")
    assert os.path.exists(table_path)
    from matinvent_tpu.models.mattergen.sample import MatterGenSampler

    sampler = MatterGenSampler(
        batch_size=8, num_batches=1, max_atoms=6,
        num_atoms_distribution="ALEX_MP_20",
        num_atoms_distribution_file=table_path, seed=0,
    )
    draws = sampler._draw_num_atoms(64)
    assert set(np.unique(draws)) <= {2, 4, 6}

    # ---- stage alignn_golden: native forwards + stub-DGL side archived
    fnr.stage_alignn_golden({})
    with open(os.path.join(fnr.OUT, "alignn_goldens.json")) as fh:
        goldens = json.load(fh)
    for task in ("band_gap", "formation_energy", "bulk_modulus"):
        vals = goldens["native"][task]
        assert isinstance(vals, list) and len(vals) == 3, (task, vals)
        assert all(np.isfinite(v) for v in vals), (task, vals)
    assert goldens["dgl_reference"]["band_gap"] == [0.5, 0.5, 0.5]

    # ---- stage distill: the wheel-builder path executes for the first time
    fnr.stage_distill({
        "steps": "40", "batch": "8", "hidden": "16", "layers": "1",
        "timesteps": "8", "max_atoms": "6", "corpus": corpus,
    })
    dist_dir = os.path.join(fnr.OUT, "distilled_mattergen_base")
    assert os.path.exists(os.path.join(dist_dir, "params.msgpack"))
    with open(os.path.join(dist_dir, "distill_summary.json")) as fh:
        summary = json.load(fh)
    assert "heldout" in json.dumps(summary) or summary  # archived verification

    # ---- stage rl_smoke: one RL iteration, distilled model + ALIGNN reward
    monkeypatch.setenv("ALIGNN_MODEL_DIR", snap)
    cwd = os.getcwd()
    try:
        fnr.stage_rl_smoke({"overrides": (
            "model.finetune_cfg.timesteps=8"
            ";pipeline.finetune_cfg.accum_steps=4"
        )})
    finally:
        os.chdir(cwd)
    run_dir = os.path.join(fnr.OUT, "rl_smoke")
    assert os.path.isdir(run_dir) and os.listdir(run_dir)

    # ---- idempotence: every stage skips on re-invocation
    capsys.readouterr()
    fnr.stage_alex_table({})
    fnr.stage_alignn_golden({})
    fnr.stage_distill({})
    out = capsys.readouterr().out
    assert out.count("exists; skip") == 3, out


def test_rl_smoke_requires_distill_first(tmp_path, monkeypatch):
    fnr = _load_module("tools/first_networked_run.py", "_fnr")
    monkeypatch.setattr(fnr, "OUT", str(tmp_path / "fnr"))
    with pytest.raises(SystemExit, match="run stage `distill` first"):
        fnr.stage_rl_smoke({})


def test_wheel_builder_failure_message_names_the_wheel():
    """Without the wheel the builder must explain exactly what to install."""
    dm = _load_module("tools/distill_mattergen.py", "_dm")
    assert "mattergen" not in sys.modules  # the real wheel is absent here
    with pytest.raises(ImportError, match="external `mattergen` wheel"):
        dm._builder_mattergen_wheel({"lightning_module": {}}, {})


def test_stage_opts_routing():
    """main() routes <stage>.<key>=<value> to the right stage only."""
    fnr = _load_module("tools/first_networked_run.py", "_fnr")
    seen = {}
    fnr.STAGES = {
        "a": lambda opts: seen.setdefault("a", opts),
        "b": lambda opts: seen.setdefault("b", opts),
    }
    fnr.main(["stages=a,b", "a.x=1", "b.y=2"])
    assert seen == {"a": {"x": "1"}, "b": {"y": "2"}}
