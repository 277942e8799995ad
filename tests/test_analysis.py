"""Analysis-toolkit smoke tests (attention dumps, curves, embeddings,
molecule drawing) — the reference's L5 scripts as library functions."""

import json
import os

import numpy as np
import pytest

import jax

from eagcn_tpu.analysis import (
    atom_kmeans,
    attention_heatmaps,
    extract_attention,
    mol_projection,
    plot_curves,
    print_attention,
    read_metrics,
)
from eagcn_tpu.analysis.draw import draw_molecule
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.utils.debug import assert_finite_tree, checked


@pytest.fixture(scope="module")
def small_params():
    cfg = benchmark_config("freesolv")
    cfg.model.n_bfeat = 6
    cfg.model.sgc1 = (8,) * 5
    cfg.model.sgc2 = (8,) * 5
    params, _ = init_eagcn(jax.random.key(0), cfg.model)
    return params


class TestAttention:
    def test_extract(self, small_params):
        entries = extract_attention(small_params)
        assert len(entries) == 4
        assert len(entries[0]["views"]) == 5
        att = entries[0]["views"][0]["attention"]
        assert att.shape == (6,)
        assert ((att > 0) & (att < 1)).all()       # sigmoided
        assert "consensus_weights" in entries[3]

    def test_print(self, small_params, capsys):
        print_attention(small_params, bondtype_list=list("abcdef"))
        out = capsys.readouterr().out
        assert "layer 1" in out and "bond order" in out

    def test_heatmaps(self, small_params, tmp_path):
        p = attention_heatmaps(small_params, str(tmp_path / "att.png"))
        assert os.path.getsize(p) > 1000


class TestCurves:
    def test_roundtrip(self, tmp_path):
        jl = tmp_path / "run.jsonl"
        with open(jl, "w") as f:
            for e in range(3):
                f.write(json.dumps({
                    "event": "metrics", "epoch": e + 1, "step": e * 10,
                    "loss": 1.0 / (e + 1), "Validation RMSE": 2.0 - e * 0.1,
                    "Test RMSE": 2.1 - e * 0.1,
                }) + "\n")
        assert len(read_metrics(str(jl))) == 3
        p = plot_curves(str(jl), str(tmp_path / "c.png"))
        assert os.path.getsize(p) > 1000


class TestEmbeddings:
    @pytest.fixture(scope="class")
    def reps_npz(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("reps")
        rng = np.random.default_rng(0)
        path = str(d / "reps.npz")
        np.savez(
            path,
            atom_rep=rng.normal(size=(300, 16)).astype(np.float32),
            atom_subtype=rng.integers(1, 10, 300),
            atom_mol_index=rng.integers(0, 30, 300),
            graph_rep=rng.normal(size=(30, 8)).astype(np.float32),
            mol_index=np.arange(30),
            labels=rng.normal(size=(30, 1)).astype(np.float32),
            predictions=rng.normal(size=(30, 1)).astype(np.float32),
        )
        return path

    def test_kmeans(self, reps_npz):
        out = atom_kmeans(reps_npz, n_clusters=4)
        assert out["confusion"].shape[0] == 4
        assert out["confusion"].sum() == 300

    def test_mol_projection(self, reps_npz, tmp_path):
        p = mol_projection(reps_npz, str(tmp_path / "m.png"), method="pca")
        assert os.path.getsize(p) > 1000


class TestDraw:
    def test_draw_caffeine(self, tmp_path):
        p = draw_molecule("CN1C=NC2=C1C(=O)N(C(=O)N2C)C",
                          str(tmp_path / "caffeine.png"), title="caffeine")
        assert os.path.getsize(p) > 1000


class TestDebug:
    def test_assert_finite(self):
        assert_finite_tree({"a": np.ones(3)})
        with pytest.raises(FloatingPointError):
            assert_finite_tree({"a": np.array([1.0, np.nan])})

    def test_checked_catches_nan(self):
        import jax.numpy as jnp

        f = checked(lambda x: jnp.log(x) / 0.0 * 0.0 + jnp.sqrt(x))
        with pytest.raises(Exception):
            f(jnp.asarray(-1.0))
