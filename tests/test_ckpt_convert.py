"""Checkpoint conversion tests: MatterGen torch<->native round trip with
forward parity, GemNet rejection, DiffCSP scaler ingestion (VERDICT r1
missing #1/#3)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matinvent_tpu.models.batch import CrystalBatch
from matinvent_tpu.models.mattergen.diffusion import (
    MatterGenConfig,
    MatterGenDiffusion,
)
from matinvent_tpu.models.suite.mattergen_import import (
    detect_gemnet,
    mattergen_params_from_state_dict,
    mattergen_state_dict_from_params,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mg():
    cfg = MatterGenConfig(
        hidden_dim=32, num_layers=2, time_dim=16, timesteps=8,
        condition_fields=("dft_mag_density",),
    )
    d = MatterGenDiffusion(cfg)
    params = d.init_params(jax.random.PRNGKey(3), batch_size=2, max_atoms=6)
    return d, params


def small_batch():
    return CrystalBatch(
        atom_types=jnp.array([[3, 8, 3, 0], [11, 17, 0, 0]], jnp.int32),
        frac_coords=jnp.asarray(
            np.random.default_rng(0).random((2, 4, 3)), jnp.float32
        ),
        lattice=jnp.eye(3)[None].repeat(2, 0) * 4.5,
        num_atoms=jnp.array([3, 2], jnp.int32),
    )


class TestMatterGenStateDictRoundtrip:
    def test_roundtrip_bit_exact(self, mg):
        d, params = mg
        sd = mattergen_state_dict_from_params(params)
        # torch-style naming conventions present
        assert any(k.endswith(".weight") for k in sd)
        assert all(k.startswith("decoder.") for k in sd)
        template = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)
        back = mattergen_params_from_state_dict(sd, template)
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_forward_parity_through_roundtrip(self, mg):
        d, params = mg
        b = small_batch()
        noised, targets, _ = d.add_noise(jax.random.PRNGKey(1), b, 3)
        loss0, _ = d.sample_losses(params, noised, targets, b.num_atoms, b.mask)
        sd = mattergen_state_dict_from_params(params)
        template = d.init_params(jax.random.PRNGKey(9), batch_size=2, max_atoms=6)
        back = jax.tree.map(jnp.asarray, mattergen_params_from_state_dict(sd, template))
        loss1, _ = d.sample_losses(back, noised, targets, b.num_atoms, b.mask)
        np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1), rtol=1e-6)

    def test_gemnet_rejected(self, mg):
        d, params = mg
        template = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)
        fake = {"gemnet.int_blocks.0.mlp_rbf.weight": np.zeros((4, 4))}
        assert detect_gemnet(fake)
        with pytest.raises(ValueError, match="GemNet"):
            mattergen_params_from_state_dict(fake, template)

    def test_shape_mismatch_rejected(self, mg):
        d, params = mg
        sd = mattergen_state_dict_from_params(params)
        key = next(k for k in sd if k.endswith("pos_out.weight"))
        sd[key] = np.zeros((5, 5), np.float32)
        template = d.init_params(jax.random.PRNGKey(0), batch_size=2, max_atoms=6)
        with pytest.raises(ValueError, match="shape"):
            mattergen_params_from_state_dict(sd, template)


@pytest.mark.slow
class TestConvertCLI:
    def test_to_torch_to_native_roundtrip(self, mg, tmp_path):
        """native -> torch container -> native via the CLI tool; forward
        parity end to end, incl. suite auto-import of last.ckpt."""
        import importlib.util

        from matinvent_tpu.models.suite.mattergen import MatterGenSuite

        d, params = mg
        suite = MatterGenSuite(
            model_name="mattergen_dft_mag_density",
            model_cfg=dict(
                hidden_dim=32, num_layers=2, time_dim=16, timesteps=8,
                condition_fields=["dft_mag_density"],
            ),
        )
        native1 = tmp_path / "native1"
        suite.save_model(params, str(native1))

        spec = importlib.util.spec_from_file_location(
            "convert_mattergen_ckpt",
            os.path.join(REPO, "tools", "convert_mattergen_ckpt.py"),
        )
        tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tool)

        torch_dir = tmp_path / "torchfmt"
        tool.main(["to_torch", f"in={native1}", f"out={torch_dir}"])
        assert (torch_dir / "last.ckpt").exists()

        native2 = tmp_path / "native2"
        tool.main(["to_native", f"in={torch_dir / 'last.ckpt'}", f"out={native2}"])

        # suite loads both native msgpack and the raw torch container
        for load_path in (native2, torch_dir):
            s2 = MatterGenSuite(
                model_name="mattergen_dft_mag_density",
                model_path=str(load_path),
            )
            d2, p2 = s2.load_model()
            b = small_batch()
            noised, targets, _ = d.add_noise(jax.random.PRNGKey(1), b, 3)
            l0, _ = d.sample_losses(params, noised, targets, b.num_atoms, b.mask)
            l1, _ = d2.sample_losses(p2, noised, targets, b.num_atoms, b.mask)
            np.testing.assert_allclose(
                np.asarray(l0), np.asarray(l1), rtol=1e-6
            )


class TestDiffCSPScalerIngestion:
    def _suite(self, model_path):
        from matinvent_tpu.models.suite.diffcsp import DiffCSPSuite

        return DiffCSPSuite(
            model_name="diffcsp",
            model_cfg=dict(hidden_dim=16, num_layers=1, time_dim=16, timesteps=4),
            model_path=str(model_path) if model_path else None,
        )

    def test_reference_pt_scalers_ingested(self, tmp_path):
        """Pickled reference-style scaler objects load through the module
        shim (models.diffcsp.utils.StandardScalerTorch does not exist here)."""
        import types

        import torch

        # fabricate the exact pickle a reference checkpoint dir contains:
        # an object whose class lives at models.diffcsp.utils
        mod = types.ModuleType("models.diffcsp.utils")

        class StandardScalerTorch:
            pass

        StandardScalerTorch.__module__ = "models.diffcsp.utils"
        StandardScalerTorch.__qualname__ = "StandardScalerTorch"
        mod.StandardScalerTorch = StandardScalerTorch
        pkg_m, pkg_d = types.ModuleType("models"), types.ModuleType("models.diffcsp")
        saved = {
            k: sys.modules.get(k)
            for k in ("models", "models.diffcsp", "models.diffcsp.utils")
        }
        sys.modules.update(
            {"models": pkg_m, "models.diffcsp": pkg_d, "models.diffcsp.utils": mod}
        )
        try:
            obj = StandardScalerTorch()
            obj.means = torch.tensor([1.5, 2.5, 3.5])
            obj.stds = torch.tensor([0.1, 0.2, 0.3])
            torch.save(obj, tmp_path / "lattice_scaler.pt")
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v

        # a native checkpoint next to the scaler
        suite0 = self._suite(None)
        d0, p0 = suite0.load_model()
        suite0.save_model(p0, str(tmp_path))

        suite = self._suite(tmp_path)
        _, _ = suite.load_model()
        assert suite.lattice_scaler is not None
        np.testing.assert_allclose(
            np.asarray(suite.lattice_scaler.means), [1.5, 2.5, 3.5]
        )
        assert suite.diffusion.lattice_scaler is suite.lattice_scaler

    def test_scalers_roundtrip_through_save(self, tmp_path):
        from matinvent_tpu.utils.scaler import StandardScaler

        suite = self._suite(None)
        d, p = suite.load_model()
        suite.lattice_scaler = StandardScaler(
            np.array([4.0, 4.0, 4.0]), np.array([1.0, 1.0, 1.0])
        )
        out = tmp_path / "ckpt"
        suite.save_model(p, str(out))
        assert (out / "scalers.npz").exists()

        suite2 = self._suite(out)
        suite2.load_model()
        assert suite2.lattice_scaler is not None
        np.testing.assert_allclose(np.asarray(suite2.lattice_scaler.means), 4.0)
        assert suite2.prop_scaler is None

    def test_fit_matches_reference_semantics(self):
        """ddof=0 + 1e-5 epsilon (reference utils.py:889-892)."""
        from matinvent_tpu.utils.scaler import StandardScaler

        x = np.array([[1.0], [2.0], [3.0]])
        s = StandardScaler().fit(x)
        np.testing.assert_allclose(
            float(s.stds[0]), np.std(x[:, 0], ddof=0) + 1e-5, rtol=1e-6
        )
