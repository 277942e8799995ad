"""GCN / GAT baseline structures train end to end (a few steps, loss
decreases; `models.py:63-73` structure switch parity)."""

import numpy as np
import pytest

import jax

from eagcn_tpu.data import BatchShape, batch_to_jax, get_spec, iter_batches, \
    load_dataset
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.train import make_optimizer, make_train_step
from eagcn_tpu.train.metrics import r_squared
from eagcn_tpu.utils import benchmark_config


@pytest.mark.parametrize("structure", ["GCN", "GAT"])
def test_baseline_structure_trains(structure):
    ds = load_dataset(get_spec("freesolv"))
    cfg = benchmark_config("freesolv", structure=structure)
    cfg.model.n_bfeat = ds.n_bfeat
    cfg.model.sgc1 = (8,) * 5
    cfg.model.sgc2 = (8,) * 5
    cfg.model.n_den1, cfg.model.n_den2 = 16, 8
    shape = BatchShape(num_nodes=256, num_edges=512, num_mols=16)
    batch = batch_to_jax(next(iter_batches(ds, np.arange(16), shape)))

    params, state = init_eagcn(jax.random.key(0), cfg.model)
    tx = make_optimizer(1e-2, 0.0)
    opt_state = tx.init(params)
    step = make_train_step(cfg.model, "reg", tx)
    losses = []
    for i in range(25):
        params, state, opt_state, loss = step(
            params, state, opt_state, batch, jax.random.key(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_r_squared_matches_scipy():
    import scipy.stats

    rng = np.random.default_rng(0)
    x = rng.normal(size=50)
    y = 2 * x + rng.normal(size=50)
    slope, intercept, r, p, se = scipy.stats.linregress(x, y)
    assert abs(r_squared(x, y) - r**2) < 1e-12


def test_gat_runs_on_tile_backend_via_ell_fallback():
    """GAT under a tile/pallas config transparently uses the ELL tables
    (softmax is neighborhood-local); logits must match the ell config."""
    from eagcn_tpu.data.batching import pick_tile_size
    from eagcn_tpu.models import apply_eagcn

    ds = load_dataset(get_spec("freesolv"))
    cfg = benchmark_config("freesolv", structure="GAT")
    cfg.model.n_bfeat = ds.n_bfeat
    cfg.model.sgc1 = (8,) * 5
    cfg.model.sgc2 = (8,) * 5
    cfg.model.n_den1, cfg.model.n_den2 = 16, 8
    tile = pick_tile_size(int(ds.sizes()[:16].max()))
    shape = BatchShape(num_nodes=1024, num_edges=512, num_mols=16,
                       tile_size=tile)
    batch = batch_to_jax(next(iter_batches(ds, np.arange(16), shape)))
    params, state = init_eagcn(jax.random.key(0), cfg.model)

    import dataclasses
    logits = {}
    for backend in ("ell", "tile"):
        mcfg = dataclasses.replace(cfg.model, backend=backend)
        logits[backend], _, _, _ = apply_eagcn(
            params, state, batch, mcfg, train=False)
    np.testing.assert_allclose(np.asarray(logits["ell"]),
                               np.asarray(logits["tile"]),
                               rtol=1e-5, atol=1e-6)
