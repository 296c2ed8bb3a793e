"""Native published-ALIGNN backend: graph semantics, forward parity vs an
independent NumPy oracle, checkpoint ingestion (HF folder + figshare zip),
and the calculator task surface.

The alignn/dgl packages are not installable here, so the oracle is an
independent loop-based NumPy implementation of the published equations
(different code path from the padded/segment JAX forward) — it catches
padding, masking, direction, and aggregation bugs; spec-level fidelity is
by construction (state-dict naming + alignn 2024.12.12 semantics).
"""
from __future__ import annotations

import json
import os
import zipfile

import numpy as np
import pytest

from matinvent_tpu.chem.structure import Structure
from matinvent_tpu.rewards.calculators.alignn.graphs import (
    bond_cosines,
    build_batch,
    knn_edges,
    line_graph_pairs,
)
from matinvent_tpu.rewards.calculators.alignn.load import load_alignn_checkpoint
from matinvent_tpu.rewards.calculators.alignn.model import ALIGNNSpec, run_batch

HID, EMB, ABINS, EBINS, AFEAT = 16, 8, 10, 12, 92


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _make_state_dict(rng, norm="batchnorm", alignn_layers=2, gcn_layers=2,
                     hidden=HID, out_features=1):
    sd = {}

    def lin(name, nin, nout):
        sd[f"{name}.weight"] = rng.normal(0, 0.3, (nout, nin)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, (nout,)).astype(np.float32)

    def nrm(name, n):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, (n,)).astype(np.float32)
        if norm == "batchnorm":
            sd[f"{name}.running_mean"] = rng.normal(0, 0.2, (n,)).astype(np.float32)
            sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, (n,)).astype(np.float32)
            sd[f"{name}.num_batches_tracked"] = np.array(10, dtype=np.int64)

    def mlp(name, nin, nout):
        lin(f"{name}.layer.0", nin, nout)
        nrm(f"{name}.layer.1", nout)

    mlp("atom_embedding", AFEAT, hidden)
    sd["edge_embedding.0.centers"] = np.linspace(0, 8, EBINS).astype(np.float32)
    mlp("edge_embedding.1", EBINS, EMB)
    mlp("edge_embedding.2", EMB, hidden)
    sd["angle_embedding.0.centers"] = np.linspace(-1, 1, ABINS).astype(np.float32)
    mlp("angle_embedding.1", ABINS, EMB)
    mlp("angle_embedding.2", EMB, hidden)

    def egc(prefix):
        for part in ("src_gate", "dst_gate", "edge_gate", "src_update", "dst_update"):
            lin(f"{prefix}.{part}", hidden, hidden)
        nrm(f"{prefix}.bn_edges", hidden)
        nrm(f"{prefix}.bn_nodes", hidden)

    for i in range(alignn_layers):
        egc(f"alignn_layers.{i}.node_update")
        egc(f"alignn_layers.{i}.edge_update")
    for i in range(gcn_layers):
        egc(f"gcn_layers.{i}")
    lin("fc", hidden, out_features)
    return sd


def _model_config(alignn_layers=2, gcn_layers=2, hidden=HID, link="identity"):
    return {
        "alignn_layers": alignn_layers,
        "gcn_layers": gcn_layers,
        "atom_input_features": AFEAT,
        "edge_input_features": EBINS,
        "triplet_input_features": ABINS,
        "embedding_features": EMB,
        "hidden_features": hidden,
        "output_features": 1,
        "link": link,
        "classification": False,
    }


def _atom_init(path, rng):
    table = {str(z): rng.normal(0, 1, (AFEAT,)).round(4).tolist() for z in range(1, 90)}
    with open(path, "w") as fh:
        json.dump(table, fh)
    return path


# ---------------------------------------------------------------- oracle

def _oracle_norm(sd, name, v, norm):
    w, b = sd[f"{name}.weight"], sd[f"{name}.bias"]
    if norm == "batchnorm":
        m, var = sd[f"{name}.running_mean"], sd[f"{name}.running_var"]
        return (v - m) / np.sqrt(var + 1e-5) * w + b
    mu = v.mean(-1, keepdims=True)
    s = v.var(-1, keepdims=True)
    return (v - mu) / np.sqrt(s + 1e-5) * w + b


def _oracle_lin(sd, name, v):
    return v @ sd[f"{name}.weight"].T + sd[f"{name}.bias"]


def _oracle_mlp(sd, name, v, norm):
    return _silu(_oracle_norm(sd, f"{name}.layer.1", _oracle_lin(sd, f"{name}.layer.0", v), norm))


def _oracle_rbf(centers, x):
    gamma = 1.0 / np.diff(centers).mean()
    return np.exp(-gamma * (x[:, None] - centers[None, :]) ** 2)


def _oracle_egc(sd, prefix, x, y, src, dst, norm):
    m = (
        _oracle_lin(sd, f"{prefix}.src_gate", x)[src]
        + _oracle_lin(sd, f"{prefix}.dst_gate", x)[dst]
        + _oracle_lin(sd, f"{prefix}.edge_gate", y)
    )
    sig = 1.0 / (1.0 + np.exp(-m))
    bh = _oracle_lin(sd, f"{prefix}.dst_update", x)[src]
    acc = np.zeros_like(x)
    ssum = np.zeros_like(x)
    for e in range(len(src)):  # deliberate slow loop: independent path
        acc[dst[e]] += sig[e] * bh[e]
        ssum[dst[e]] += sig[e]
    h = acc / (ssum + 1e-6)
    x_new = x + _silu(_oracle_norm(sd, f"{prefix}.bn_nodes",
                                   _oracle_lin(sd, f"{prefix}.src_update", x) + h, norm))
    y_new = y + _silu(_oracle_norm(sd, f"{prefix}.bn_edges", m, norm))
    return x_new, y_new


def _oracle_forward(sd, spec, structures, atom_table, norm):
    out = []
    for s in structures:
        src, dst, vec = knn_edges(s)
        a, b = line_graph_pairs(src, dst)
        cos = bond_cosines(vec, a, b)
        x = _oracle_mlp(sd, "atom_embedding", atom_table[np.asarray(s.species)], norm)
        y = _oracle_rbf(sd["edge_embedding.0.centers"], np.linalg.norm(vec, axis=-1))
        y = _oracle_mlp(sd, "edge_embedding.1", y, norm)
        y = _oracle_mlp(sd, "edge_embedding.2", y, norm)
        z = _oracle_rbf(sd["angle_embedding.0.centers"], cos)
        z = _oracle_mlp(sd, "angle_embedding.1", z, norm)
        z = _oracle_mlp(sd, "angle_embedding.2", z, norm)
        for i in range(spec.alignn_layers):
            x, y = _oracle_egc(sd, f"alignn_layers.{i}.node_update", x, y, src, dst, norm)
            y, z = _oracle_egc(sd, f"alignn_layers.{i}.edge_update", y, z, a, b, norm)
        for i in range(spec.gcn_layers):
            x, y = _oracle_egc(sd, f"gcn_layers.{i}", x, y, src, dst, norm)
        h = x.mean(axis=0)
        out.append(float(_oracle_lin(sd, "fc", h[None])[0, 0]))
    return np.asarray(out)


def _structures():
    rng = np.random.default_rng(3)
    rocksalt = Structure.from_parameters(
        [4.2] * 3, [90] * 3, [11, 17], [[0, 0, 0], [0.5, 0.5, 0.5]]
    )
    tri = Structure(
        lattice=np.array([[5.1, 0, 0], [1.1, 4.8, 0], [0.4, 0.3, 5.5]]),
        species=[3, 8, 8, 22],
        frac_coords=rng.uniform(0, 1, (4, 3)),
    )
    return [rocksalt, tri]


# ----------------------------------------------------------------- tests

class TestGraphs:
    def test_simple_cubic_tie_inclusion(self):
        # simple cubic (exact diagonal lattice so shell distances tie
        # bitwise): shells of 6 (a) then 12 (a*sqrt2); the 12th-nearest sits
        # in the sqrt2 shell, so ties push the kept images to 18. Self-pairs
        # keep image AND -image as distinct canonical entries (jarvis
        # semantics), so 18 images -> 36 directed edges.
        s = Structure(lattice=np.eye(3) * 3.0, species=[29],
                      frac_coords=np.zeros((1, 3)))
        src, dst, vec = knn_edges(s, cutoff=8.0, max_neighbors=12)
        assert (src == 0).all() and (dst == 0).all()
        assert len(src) == 36
        d = np.linalg.norm(vec, axis=-1)
        assert np.isclose(d.min(), 3.0) and np.isclose(d.max(), 3.0 * np.sqrt(2))

    def test_symmetric_directed_pairs(self):
        for s in _structures():
            src, dst, vec = knn_edges(s)
            seen = {}
            for k in range(len(src)):
                key = (src[k], dst[k], tuple(np.round(vec[k], 6)))
                rkey = (dst[k], src[k], tuple(np.round(-vec[k], 6)))
                seen[key] = seen.get(key, 0) + 1
                assert rkey not in seen or True
            # every directed edge has its reverse with negated displacement
            keys = set(seen)
            for (u, v, r) in keys:
                assert (v, u, tuple(-np.asarray(r))) in keys

    def test_cutoff_expansion_small_cell(self):
        # 1 atom in a huge cell: within 8 A there are no neighbors at all;
        # the builder must widen the cutoff instead of failing
        s = Structure.from_parameters([12.0] * 3, [90] * 3, [6], [[0, 0, 0]])
        src, dst, vec = knn_edges(s, cutoff=8.0, max_neighbors=12)
        assert len(src) >= 12

    def test_line_graph_counts(self):
        s = _structures()[0]
        src, dst, _ = knn_edges(s)
        a, b = line_graph_pairs(src, dst)
        # every pair (a, b) satisfies dst[a] == src[b] (shared pivot atom)
        assert (dst[a] == src[b]).all()
        # per-edge in-degree equals in-degree of its source atom
        indeg = np.bincount(dst, minlength=s.num_atoms)
        for e in range(len(src)):
            assert int((b == e).sum()) == int(indeg[src[e]])


class TestForwardParity:
    @pytest.mark.parametrize("norm", ["batchnorm", "layernorm"])
    def test_matches_numpy_oracle(self, norm):
        rng = np.random.default_rng(0)
        sd = _make_state_dict(rng, norm=norm)
        spec = ALIGNNSpec.from_model_config(_model_config(), norm)
        atom_table = rng.normal(0, 1, (101, AFEAT)).astype(np.float32)
        structures = _structures()
        batch = build_batch(structures, pad_multiple=64)
        got = run_batch({k: np.asarray(v) for k, v in sd.items()}, spec,
                        atom_table, batch)
        want = _oracle_forward(sd, spec, structures, atom_table, norm)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_permutation_invariance(self):
        rng = np.random.default_rng(1)
        sd = _make_state_dict(rng)
        spec = ALIGNNSpec.from_model_config(_model_config(), "batchnorm")
        atom_table = rng.normal(0, 1, (101, AFEAT)).astype(np.float32)
        s = _structures()[1]
        perm = np.array([2, 0, 3, 1])
        sp = Structure(lattice=s.lattice, species=np.asarray(s.species)[perm],
                       frac_coords=s.frac_coords[perm])
        a = run_batch(sd, spec, atom_table, build_batch([s], pad_multiple=64))
        b = run_batch(sd, spec, atom_table, build_batch([sp], pad_multiple=64))
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_batch_equals_singles(self):
        rng = np.random.default_rng(2)
        sd = _make_state_dict(rng)
        spec = ALIGNNSpec.from_model_config(_model_config(), "batchnorm")
        atom_table = rng.normal(0, 1, (101, AFEAT)).astype(np.float32)
        structures = _structures()
        both = run_batch(sd, spec, atom_table, build_batch(structures, pad_multiple=64))
        singles = [
            run_batch(sd, spec, atom_table, build_batch([s], pad_multiple=64))[0]
            for s in structures
        ]
        np.testing.assert_allclose(both, singles, rtol=1e-4)


class TestIngestion:
    def _write_hf(self, root, sd, cfg, rng):
        import torch

        d = os.path.join(root, "prop_pred", "alignn", "band_gap")
        os.makedirs(d, exist_ok=True)
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   os.path.join(d, "best_model.pt"))
        with open(os.path.join(d, "config.json"), "w") as fh:
            json.dump({"model": cfg}, fh)
        _atom_init(os.path.join(d, "atom_init.json"), rng)
        return d

    def test_hf_folder_roundtrip(self, tmp_path):
        rng = np.random.default_rng(4)
        sd = _make_state_dict(rng)
        d = self._write_hf(str(tmp_path), sd, _model_config(), rng)
        params, spec, table = load_alignn_checkpoint(d)
        assert spec.hidden_features == HID and spec.norm_kind == "batchnorm"
        for k, v in sd.items():
            if v.ndim:
                np.testing.assert_array_equal(np.asarray(params[k]), v)

    def test_figshare_zip_roundtrip(self, tmp_path):
        import torch

        rng = np.random.default_rng(5)
        sd = _make_state_dict(rng, norm="layernorm")
        zpath = tmp_path / "mp_gappbe_alignn.zip"
        pt = tmp_path / "tmp.pt"
        torch.save({"model": {k: torch.as_tensor(np.array(v)) for k, v in sd.items()}},
                   str(pt))
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr("mp_gappbe_alignn/config.json",
                       json.dumps({"model": _model_config(link="log")}))
            z.write(str(pt), "mp_gappbe_alignn/best_model.pt")
        _atom_init(str(tmp_path / "atom_init.json"), rng)
        params, spec, table = load_alignn_checkpoint(str(zpath))
        assert spec.link == "log" and spec.norm_kind == "layernorm"
        # link=log applies exp at the head: outputs strictly positive
        got = run_batch(params, spec, table, build_batch(_structures(), pad_multiple=64))
        assert (got > 0).all()

    def test_missing_atom_init_is_loud(self, tmp_path):
        import torch

        rng = np.random.default_rng(6)
        sd = _make_state_dict(rng)
        d = tmp_path / "band_gap"
        os.makedirs(d)
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   str(d / "best_model.pt"))
        with open(d / "config.json", "w") as fh:
            json.dump({"model": _model_config()}, fh)
        with pytest.raises(FileNotFoundError, match="atom_init"):
            load_alignn_checkpoint(str(d))

    def test_unsupported_option_refused(self, tmp_path):
        import torch

        rng = np.random.default_rng(7)
        sd = _make_state_dict(rng)
        d = tmp_path / "band_gap"
        os.makedirs(d)
        torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                   str(d / "best_model.pt"))
        cfg = _model_config()
        cfg["use_cutoff_function"] = True
        with open(d / "config.json", "w") as fh:
            json.dump({"model": cfg}, fh)
        _atom_init(str(d / "atom_init.json"), rng)
        with pytest.raises(ValueError, match="use_cutoff_function"):
            load_alignn_checkpoint(str(d))


class TestCalculator:
    def test_direct_and_derived_tasks(self, tmp_path):
        import torch

        from matinvent_tpu.rewards.calculators.alignn import ALIGNN

        rng = np.random.default_rng(8)
        cfg = _model_config()
        root = tmp_path / "models"
        for prop in ("band_gap", "bulk_modulus_voigt", "shear_modulus_voigt"):
            d = root / "prop_pred" / "alignn" / prop
            os.makedirs(d)
            sd = _make_state_dict(rng)
            torch.save({k: torch.as_tensor(np.array(v)) for k, v in sd.items()},
                       str(d / "best_model.pt"))
            with open(d / "config.json", "w") as fh:
                json.dump({"model": cfg}, fh)
        _atom_init(str(root / "prop_pred" / "alignn" / "atom_init.json"), rng)

        structures = _structures()
        calc = ALIGNN(str(tmp_path / "rew"), task="band_gap", model_dir=str(root))
        gap = calc.calc((structures, None), label="t")
        assert gap.shape == (2,) and np.isfinite(gap).all()
        assert (gap >= 0).all()  # band_gap clamps negatives

        calc_v = ALIGNN(str(tmp_path / "rew2"), task="vickers_hardness",
                        model_dir=str(root))
        vick = calc_v.calc((structures, None), label="t")
        assert vick.shape == (2,) and np.isfinite(vick).all() and (vick >= 0).all()
        # derived-path artifacts saved like the reference (calc.py:106-110)
        assert os.path.exists(tmp_path / "rew2" / "t_bulk.txt")

    def test_missing_checkpoint_is_loud(self, tmp_path):
        from matinvent_tpu.rewards.calculators.alignn import ALIGNN

        calc = ALIGNN(str(tmp_path / "rew"), task="band_gap",
                      model_dir=str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError, match="band_gap"):
            calc.calc((_structures(), None), label="t")
