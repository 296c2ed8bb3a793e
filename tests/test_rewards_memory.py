"""Reward aggregator, empirical calculators, replay buffer, LTM tests
(SURVEY.md §4 strategy (c): fake/analytic calculators, no network)."""
import numpy as np
import pytest

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.memory import LongTimeMem, ReplayBuffer
from matinvent_tpu.rewards import Reward
from matinvent_tpu.rewards.calculators.empirical import (
    Empirical,
    calc_density,
    calc_hhi,
    calc_log_abundance_crust,
    calc_price,
    make_substrate,
    calc_mcia,
)


def make_struc(species, a=5.0):
    n = len(species)
    coords = np.linspace(0, 1, n, endpoint=False)[:, None] * np.array([[1, 1, 1]])
    return Structure.from_parameters([a] * 3, [90] * 3, species, coords)


@pytest.fixture
def strucs():
    return [
        make_struc([11, 17]),        # NaCl
        make_struc([26, 26, 8, 8, 8]),  # Fe2O3-ish
        make_struc([79]),            # Au
    ]


class TestCalculators:
    def test_density_positive(self, strucs):
        d = calc_density(strucs)
        assert (d > 0).all()
        # Au in a 125 A^3 cell: 196.97/6.022e23 / 125e-24 ~ 2.6 g/cm3
        assert abs(d[2] - 196.97 / 6.02214076e23 / 125e-24) < 1e-6

    def test_hhi_and_price_finite(self, strucs):
        assert np.isfinite(calc_hhi(strucs)).all()
        assert np.isfinite(calc_price(strucs)).all()

    def test_missing_element_gives_nan(self):
        s = make_struc([99])  # Es: no HHI/price data
        assert np.isnan(calc_hhi([s]))[0]
        assert np.isnan(calc_price([s]))[0]

    def test_hhi_gaultois_spot_values(self):
        """Spot-check the vendored Gaultois 2013 HHI tables against
        well-published values (the dataset pymatgen's HHIModel ships;
        reference path rewards/calculators/pymatgen/calc.py:57-73)."""
        from matinvent_tpu.chem.data import HHI_PRODUCTION, HHI_RESERVE

        # rare earths: production ~monopolized (9500), reserves spread (3100)
        for el in ("La", "Ce", "Nd", "Dy"):
            assert HHI_PRODUCTION[el] == 9500.0
            assert HHI_RESERVE[el] == 3100.0
        assert HHI_RESERVE["Co"] == 2700.0
        assert HHI_RESERVE["Li"] == 4200.0
        assert HHI_RESERVE["Nb"] == 8800.0
        assert HHI_RESERVE["Pt"] == 9100.0
        assert HHI_PRODUCTION["Nb"] == 8500.0
        # NaCl molar-fraction weighting through the calculator
        hhi = calc_hhi([make_struc([11, 17])])[0]
        assert hhi == (HHI_RESERVE["Na"] + HHI_RESERVE["Cl"]) / 2

    def test_crustal_abundance_crc_spot_values(self):
        """CRC Handbook crustal abundances (ppm by mass) — the published
        dataset SMACT's crustal_abundance carries."""
        from matinvent_tpu.chem.data import CRUSTAL_ABUNDANCE_PPM

        assert CRUSTAL_ABUNDANCE_PPM["O"] == 461000.0
        assert CRUSTAL_ABUNDANCE_PPM["Si"] == 282000.0
        assert CRUSTAL_ABUNDANCE_PPM["Fe"] == 56300.0
        assert CRUSTAL_ABUNDANCE_PPM["Li"] == 20.0
        assert CRUSTAL_ABUNDANCE_PPM["Au"] == 0.004

    def test_log_abundance(self, strucs):
        la = calc_log_abundance_crust(strucs[:1])
        assert np.isfinite(la).all()

    def test_empirical_calculator_saves(self, tmp_path, strucs):
        calc = Empirical(str(tmp_path), task="density")
        res = calc.calc((strucs, None), label="t0")
        assert (tmp_path / "t0.txt").exists()
        assert len(res) == 3

    def test_mcia_self_substrate_matches(self):
        si = make_substrate("Si")
        res = calc_mcia([si], si)
        # a substrate matched against itself must find a coincident cell
        assert np.isfinite(res[0])
        assert res[0] <= 35.0  # ~a^2 = 29.5 A^2

    def test_mcia_wafer_facet_restriction(self):
        # Si substrate is restricted to (100) (reference SUB_MILLERS): the
        # self-match on that facet is exactly the a^2 surface cell
        from matinvent_tpu.rewards.calculators.empirical import SUB_MILLERS

        si = make_substrate("Si")
        res = calc_mcia([si], si, substrate_millers=SUB_MILLERS["Si"])
        assert abs(res[0] - 5.431**2) < 1.0

    def test_mcia_all_nine_substrates_instantiate(self):
        for name in (
            "Si", "Ge", "GaAs", "InP", "AlN", "GaN", "SiC", "SiO2", "Al2O3"
        ):
            s = make_substrate(name)
            assert s.num_atoms >= 4 and np.isfinite(s.volume) and s.volume > 0

    def test_mcia_miller_search_beats_001_only(self):
        # a hexagonal film whose (001) facet mismatches Si(100) badly still
        # matches through an inclined plane — the Miller search must find a
        # smaller (or any) area where the (001)-only search found none
        from matinvent_tpu.chem.structure import Structure
        from matinvent_tpu.rewards.calculators.zsl import (
            mcia_search, min_coincident_area, plane_basis,
        )

        si = make_substrate("Si")
        # orthorhombic film: (001) facet is 7.9 x 5.431 (mismatched), but the
        # (100) facet is exactly the Si conventional a^2 square
        film = Structure.from_parameters(
            [7.9, 5.431, 5.431], [90, 90, 90], [13, 7], [[0, 0, 0], [0.5, 0.5, 0.5]]
        )
        only_001 = min_coincident_area(
            plane_basis(film.lattice, (0, 0, 1)),
            plane_basis(si.lattice, (1, 0, 0)),
        )
        full = mcia_search(film.lattice, si.lattice, sub_millers=[(1, 0, 0)])
        assert full is not None and abs(full - 5.431**2) < 1.0
        if only_001 is not None:
            assert full <= only_001


class FakeCalc:
    """Analytic calculator for pipeline tests: density with optional NaN."""

    def __init__(self, values):
        self.values = np.asarray(values, dtype=float)

    def calc(self, samples, label="tmp"):
        return self.values


class TestReward:
    def test_scaling_modes(self, strucs):
        r = Reward(
            root_dir="/tmp/rw_test",
            prop_cfg=[
                dict(name="p", calculator=FakeCalc([0.0, 3.0, 6.0]),
                     target="ascending", minv=0.0, maxv=6.0),
            ],
            reward_threshold=0.5,
        )
        rewards, props, failed = r.scoring((strucs, None))
        np.testing.assert_allclose(rewards, [0.0, 0.5, 1.0])
        assert not failed.any()

        r.prop_cfg[0]["target"] = "descending"
        rewards, _, _ = r.scoring((strucs, None))
        np.testing.assert_allclose(rewards, [1.0, 0.5, 0.0])

        r.prop_cfg[0]["target"] = 3.0
        r.prop_cfg[0]["minv"] = 0.0
        r.prop_cfg[0]["maxv"] = 3.0
        rewards, _, _ = r.scoring((strucs, None))
        np.testing.assert_allclose(rewards, [0.0, 1.0, 0.0])

    def test_failed_mask_zeroes_reward(self, strucs):
        r = Reward(
            root_dir="/tmp/rw_test",
            prop_cfg=[
                dict(name="p", calculator=FakeCalc([1.0, np.nan, 5.0]),
                     target="ascending", minv=0.0, maxv=6.0),
            ],
            reward_threshold=0.5,
        )
        rewards, props, failed = r.scoring((strucs, None))
        np.testing.assert_array_equal(failed, [False, True, False])
        assert rewards[1] == 0.0

    def test_multi_prop_reduce(self, strucs):
        cfgs = [
            dict(name="a", calculator=FakeCalc([6.0, 6.0, 0.0]),
                 target="ascending", minv=0.0, maxv=6.0, weight=0.25),
            dict(name="b", calculator=FakeCalc([0.0, 6.0, 6.0]),
                 target="ascending", minv=0.0, maxv=6.0, weight=0.75),
        ]
        mean_r = Reward("/tmp/rw_test", cfgs, 0.5, reduce="mean")
        np.testing.assert_allclose(mean_r.scoring((strucs, None))[0], [0.5, 1.0, 0.5])
        min_r = Reward("/tmp/rw_test", cfgs, 0.5, reduce="min")
        np.testing.assert_allclose(min_r.scoring((strucs, None))[0], [0.0, 1.0, 0.0])
        w_r = Reward("/tmp/rw_test", cfgs, 0.5, reduce="weight")
        np.testing.assert_allclose(w_r.scoring((strucs, None))[0], [0.25, 1.0, 0.75])


class TestReplayBuffer:
    def test_topk_dedup_cutoff(self, strucs):
        rb = ReplayBuffer(buffer_size=2, sample_size=2, reward_cutoff=0.1, seed=0)
        rb.extend(["d0", "d1", "d2"], strucs, np.array([0.9, 0.5, 0.05]))
        # Au has reward 0.05 < cutoff -> dropped; 2 remain
        assert len(rb) == 2
        # duplicate comp with higher reward replaces
        rb.extend(["d3"], [strucs[1]], np.array([0.95]))
        assert len(rb) == 2
        assert rb.buffer["reward"].max() == 0.95

    def test_sample_and_purge(self, strucs):
        rb = ReplayBuffer(buffer_size=10, sample_size=2, seed=1)
        rb.extend(["a", "b", "c"], strucs, np.array([0.9, 0.8, 0.7]))
        data, rewards = rb.sample()
        assert len(data) == 2
        rb.memory_purge([strucs[0]])
        assert len(rb) == 2

    def test_empty_sample(self):
        rb = ReplayBuffer()
        data, rewards = rb.sample()
        assert data == []


class TestLTM:
    def test_extend_and_metrics(self, strucs):
        ltm = LongTimeMem()
        ltm.extend(strucs, np.array([0.9, 0.8, 0.7]), step=0)
        ltm.extend(strucs, np.array([0.95, 0.1, 0.2]), step=1)
        assert len(ltm) == 6
        assert len(ltm.unique_comps) == 3
        burden, div = ltm.calc_metrics(thred=0.5, num_candidate=2)
        # 3 unique comps above 0.5 (best-per-comp: 0.95, 0.8, 0.7) -> 6/3
        assert burden == 2.0
        assert div == 0.5

    def test_div_filter_decay(self, strucs):
        ltm = LongTimeMem()
        for step in range(4):
            ltm.extend([strucs[0]], np.array([0.9]), step)
        # NaCl occurred 4 times; tol=3, buff=6 -> decay (6-4)/(6-3)
        new_r, penalty, tol_n, buff_n = ltm.div_filter(
            [strucs[0], strucs[2]], np.array([0.9, 0.6]), tol=3, buff=6
        )
        np.testing.assert_allclose(new_r, [0.9 * 2 / 3, 0.6])
        assert tol_n == 1 and buff_n == 0 and penalty == []
        # push past buff
        for step in range(4, 8):
            ltm.extend([strucs[0]], np.array([0.9]), step)
        new_r, penalty, tol_n, buff_n = ltm.div_filter(
            [strucs[0]], np.array([0.9]), tol=3, buff=6
        )
        assert new_r[0] == 0.0 and penalty == [0] and buff_n == 1

    def test_baseline_and_save(self, tmp_path, strucs):
        ltm = LongTimeMem()
        ltm.extend(strucs, np.array([0.3, 0.5, 0.7]), step=0)
        assert abs(ltm.get_baseline(step=0) - 0.5) < 1e-9
        path = str(tmp_path / "ltm.csv")
        ltm.save(path)
        import pandas as pd

        df = pd.read_csv(path)
        assert "cif" in df.columns and len(df) == 3
