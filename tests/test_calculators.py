"""Tests for ML/remote reward calculators: SynScore ensemble, property GNN,
DFT driver with the fake scheduler, MLIP bridge graceful degradation."""
import os

import numpy as np
import pytest
import yaml

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.dft.calc import DFTCalc, dft_run
from matinvent_tpu.rewards.calculators.dft.job import (
    FakeSchedulerTransport,
    RemoteQueueJob,
)
from matinvent_tpu.rewards.calculators.predictor import PropertyPredictor
from matinvent_tpu.rewards.calculators.syn_score import SynScore


def make_struc(species, a=5.0):
    n = len(species)
    coords = np.linspace(0, 1, n, endpoint=False)[:, None] * np.array([[1, 1, 1]])
    return Structure.from_parameters([a] * 3, [90] * 3, species, coords)


@pytest.fixture
def strucs():
    return [make_struc([11, 17]), make_struc([26, 26, 8, 8, 8]), make_struc([79])]


class TestSynScore:
    def test_scores_in_unit_interval(self, tmp_path, strucs):
        calc = SynScore(str(tmp_path), n_models=8, seed=0)
        scores = calc.calc((strucs, None), "t0")
        assert scores.shape == (3,)
        assert ((scores >= 0) & (scores <= 1)).all()
        assert (tmp_path / "t0.txt").exists()

    def test_deterministic(self, tmp_path, strucs):
        c1 = SynScore(str(tmp_path), n_models=4, seed=1)
        c2 = SynScore(str(tmp_path), n_models=4, seed=1)
        np.testing.assert_allclose(
            c1.calc((strucs, None)), c2.calc((strucs, None))
        )

    def test_reference_embedding_format_loads(self, tmp_path, strucs):
        # same JSON format as the reference's element_emb.json
        import json

        emb = {s: list(np.random.default_rng(1).random(90)) for s in ["Na", "Cl", "Fe", "O", "Au"]}
        p = tmp_path / "element_emb.json"
        p.write_text(json.dumps(emb))
        calc = SynScore(str(tmp_path), emb_path=str(p), n_models=4)
        scores = calc.calc((strucs, None))
        assert np.isfinite(scores).all()

    def test_unknown_element_nan(self, tmp_path):
        import json

        p = tmp_path / "emb.json"
        p.write_text(json.dumps({"Na": list(np.zeros(90))}))
        calc = SynScore(str(tmp_path), emb_path=str(p), n_models=2)
        scores = calc.calc(([make_struc([26, 8])], None))
        assert np.isnan(scores[0])


class TestPropertyPredictor:
    def test_direct_tasks(self, tmp_path, strucs):
        calc = PropertyPredictor(str(tmp_path), task="band_gap",
                                 hidden_dim=16, num_layers=1)
        res = calc.calc((strucs, None), "t0")
        assert res.shape == (3,)
        assert (res[np.isfinite(res)] >= 0).all()  # gap clamped at 0

    def test_derived_tasks(self, tmp_path, strucs):
        for task in ["vickers_hardness", "pugh_ratio", "young_modulus", "figure_of_merit"]:
            calc = PropertyPredictor(str(tmp_path), task=task,
                                     hidden_dim=16, num_layers=1)
            res = calc.calc((strucs, None), task)
            assert res.shape == (3,)

    def test_magnetic_density_correction(self, tmp_path, strucs):
        calc = PropertyPredictor(str(tmp_path), task="magnetic_density",
                                 hidden_dim=16, num_layers=1)
        res = calc.calc((strucs, None), "t0")
        assert (res[np.isfinite(res)] >= 0).all()

    def test_oversized_structure_nan(self, tmp_path):
        calc = PropertyPredictor(str(tmp_path), task="formation_energy",
                                 hidden_dim=16, num_layers=1, max_atoms=4)
        big = make_struc([6] * 8)
        res = calc.calc(([big], None))
        assert np.isnan(res[0])


class TestDFTDriver:
    def make_config(self, tmp_path) -> str:
        cfg = dict(
            machine="remote", scheduler="slurm", hostname="fake", username="u",
            port=22, remote_dir=str(tmp_path / "remote"),
            scheduler_cmd="#!/bin/bash\n#SBATCH -N 1\n", check_interval=0,
        )
        p = tmp_path / "config.yaml"
        p.write_text(yaml.safe_dump(cfg))
        return str(p)

    def test_job_lifecycle_with_fake_scheduler(self, tmp_path):
        transport = FakeSchedulerTransport(n_polls=2, result_value=4.25)
        cfg = yaml.safe_load(open(self.make_config(tmp_path)))
        cfg.update(task="band_gap", dir="step00/00", cif=__file__, config=self.make_config(tmp_path))
        job = RemoteQueueJob.from_config(cfg, transport=transport)
        job.check_interval = 0
        result = job.submit_wait_read()
        assert float(result) == 4.25
        # protocol: mkdir, 2 puts happen via transport.files, sbatch, polls, cat
        assert any("sbatch" in c for c in transport.log)
        assert sum("squeue" in c for c in transport.log) == 3  # 2 running + 1 end
        assert any(p.endswith("sub.sh") for p in transport.files)

    def test_submit_failure_raises(self, tmp_path):
        transport = FakeSchedulerTransport(fail_submit=True)
        cfg = yaml.safe_load(open(self.make_config(tmp_path)))
        cfg.update(task="band_gap", dir="d", cif=__file__)
        job = RemoteQueueJob.from_config(cfg, transport=transport)
        with pytest.raises(RuntimeError, match="Submitting"):
            job.write_submit_job()

    def test_dft_run_nan_on_failure(self, tmp_path):
        transport = FakeSchedulerTransport(empty_result=True)
        res = dft_run("band_gap", "d", __file__, self.make_config(tmp_path), transport)
        assert np.isnan(res)

    def test_dftcalc_fan_out(self, tmp_path, strucs):
        transport = FakeSchedulerTransport(n_polls=1, result_value=2.0)
        calc = DFTCalc(
            str(tmp_path / "dft"), task="band_gap", max_node=3,
            config_path=self.make_config(tmp_path), transport=transport,
        )
        res = calc.calc((strucs, None), "step_0000")
        np.testing.assert_allclose(res, [2.0, 2.0, 2.0])
        # CIFs written per structure
        assert sorted(os.listdir(tmp_path / "dft" / "step_0000")) == ["0.cif", "1.cif", "2.cif"]


class TestMLIPBridge:
    def test_native_fallback_without_mlip_stack(self, tmp_path, strucs):
        """fairchem/quacc absent in this env: the worker falls back to the
        in-tree E(V)-curvature workflow (chem/phonon.py) and returns real
        screening-grade moduli instead of NaN."""
        from matinvent_tpu.chem.structure import save_extxyz
        from matinvent_tpu.rewards.calculators.mlip import MLIPBridge

        xyz = str(tmp_path / "in.extxyz")
        save_extxyz(strucs, xyz)
        calc = MLIPBridge(str(tmp_path), task="bulk_modulus", worker=1)
        res = calc.calc((strucs, xyz), "t0")
        assert res.shape == (3,)
        assert np.isfinite(res).all() and (res > 0).all()

    def test_phonon_native_fallback(self, tmp_path, strucs):
        """heat_capacity task: the worker subprocess falls back to the
        native Γ-point phonon workflow and returns real J/g/K values."""
        from matinvent_tpu.chem.structure import save_extxyz
        from matinvent_tpu.rewards.calculators.mlip import MLIPBridge

        xyz = str(tmp_path / "in.extxyz")
        save_extxyz(strucs, xyz)
        calc = MLIPBridge(str(tmp_path), task="heat_capacity", worker=1)
        res = calc.calc((strucs, xyz), "t0")
        assert res.shape == (3,)
        assert np.isfinite(res).all() and (res > 0).all() and (res < 10).all()


class TestSynScoreTrained:
    """The shipped ensemble (weights/syn_score.npz) must load by default and
    separate charge-balanceable from junk compositions."""

    def test_default_weights_load_and_discriminate(self, tmp_path):
        from matinvent_tpu.chem.structure import Structure
        from matinvent_tpu.rewards.calculators.syn_score import SynScore

        calc = SynScore(root_dir=str(tmp_path))
        assert calc.trained
        nacl = Structure.from_parameters(
            [5.6] * 3, [90] * 3, [11, 17], [[0, 0, 0], [0.5, 0.5, 0.5]]
        )
        junk = Structure.from_parameters(
            [5.0] * 3, [90] * 3, [54, 26, 79],
            [[0, 0, 0], [0.5, 0.5, 0.5], [0.25, 0.25, 0.25]],
        )
        scores = calc.calc(([nacl, junk], None))
        assert scores[0] > 0.5 > scores[1]
