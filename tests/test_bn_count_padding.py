"""BN padding-count A/B mode (PARITY.md item 2): with
`extra_count = B*N_max - real_nodes`, the masked BN must reproduce the
reference's padding-counting statistics (`eagcn_pytorch/layers.py:394-412`
over the per-batch-max collate `utils.py:524`): zero rows contribute
nothing to the sums but inflate the denominator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.models.norm import EPS, batch_norm_apply


def _oracle_padded(x, mask, extra, scale, bias):
    """Reference semantics: stats over real rows PLUS `extra` zero rows."""
    count = mask.sum() + extra
    xm = x * mask[:, None]
    mean = xm.sum(0) / count
    var = (xm * xm).sum(0) / count - mean**2
    return (x - mean) / np.sqrt(var + EPS) * scale + bias


class TestBNCountPadding:
    def test_matches_padded_oracle(self):
        rng = np.random.default_rng(0)
        n, f = 40, 7
        x = rng.normal(size=(n, f)).astype(np.float32)
        mask = (rng.random(n) < 0.7).astype(np.float32)
        x = x * mask[:, None]          # padding rows are zero, as in packing
        extra = 25.0                   # phantom zero rows (B*N_max - real)
        params = {"scale": jnp.asarray(rng.normal(size=f).astype(np.float32)),
                  "bias": jnp.asarray(rng.normal(size=f).astype(np.float32))}
        state = {"mean": jnp.zeros(f), "var": jnp.ones(f)}
        y, new_state = batch_norm_apply(
            params, state, jnp.asarray(x), jnp.asarray(mask), train=True,
            extra_count=extra)
        want = _oracle_padded(x, mask, extra, np.asarray(params["scale"]),
                              np.asarray(params["bias"]))
        np.testing.assert_allclose(np.asarray(y) * mask[:, None],
                                   want * mask[:, None], rtol=2e-5, atol=2e-5)
        # running stats use the inflated count too
        count = mask.sum() + extra
        mean = (x * mask[:, None]).sum(0) / count
        var = ((x * x) * mask[:, None]).sum(0) / count - mean**2
        unbiased = var * count / (count - 1)
        np.testing.assert_allclose(np.asarray(new_state["mean"]),
                                   0.1 * mean, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_state["var"]),
                                   0.9 + 0.1 * unbiased, rtol=2e-5, atol=1e-6)

    def test_zero_extra_is_masked_bn(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(30, 5)).astype(np.float32)
        mask = np.ones(30, np.float32)
        params = {"scale": jnp.ones(5), "bias": jnp.zeros(5)}
        state = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
        y0, _ = batch_norm_apply(params, state, jnp.asarray(x),
                                 jnp.asarray(mask), train=True)
        y1, _ = batch_norm_apply(params, state, jnp.asarray(x),
                                 jnp.asarray(mask), train=True,
                                 extra_count=0.0)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))

    def test_grads_flow_with_extra(self):
        """The custom VJP must accept the extra-count arg: gradient wrt x
        and params stays finite and respects the inflated denominator."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        mask = jnp.ones(16)
        params = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
        state = {"mean": jnp.zeros(4), "var": jnp.ones(4)}

        def loss(xx):
            y, _ = batch_norm_apply(params, state, xx, mask, train=True,
                                    extra_count=10.0)
            return jnp.sum(y**2)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        # numeric check on one coordinate
        e = 1e-3
        d = np.zeros((16, 4), np.float32)
        d[3, 1] = e
        num = (loss(x + d) - loss(x - d)) / (2 * e)
        np.testing.assert_allclose(float(g[3, 1]), float(num),
                                   rtol=2e-2, atol=2e-2)

    def test_model_level_flag(self):
        """cfg.bn_count_padding changes train-mode activations of the
        flagship model (and only then)."""
        from eagcn_tpu.data.batching import (BatchShape, GraphBatcher,
                                             batch_to_jax)
        from eagcn_tpu.data.synthetic import random_molecule_set
        from eagcn_tpu.models import apply_eagcn, init_eagcn
        from eagcn_tpu.utils.config import ModelConfig

        graphs, labels = random_molecule_set(0, 6, mean_atoms=9,
                                             n_bond_types=5, n_tasks=1)
        shape = BatchShape(
            num_nodes=sum(g.num_atoms for g in graphs) + 4,
            num_edges=sum(2 * g.num_bonds for g in graphs) + 4, num_mols=6)
        batch = batch_to_jax(GraphBatcher(shape).pack(
            graphs, labels, list(range(6))))
        mk = lambda pad: ModelConfig(
            n_bfeat=5, sgc1=(4,) * 5, sgc2=(4,) * 5, n_den1=8, n_den2=6,
            n_tasks=1, dropout=0.0, structure="Concate", backend="ell",
            bn_count_padding=pad)
        params, state = init_eagcn(jax.random.key(0), mk(False))
        out0, _, _, _ = apply_eagcn(params, state, batch, mk(False),
                                    train=True)
        out1, _, _, _ = apply_eagcn(params, state, batch, mk(True),
                                    train=True)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))
        # eval mode is stats-driven, flag must not touch the eval math
        ev0, _, _, _ = apply_eagcn(params, state, batch, mk(False),
                                   train=False)
        ev1, _, _, _ = apply_eagcn(params, state, batch, mk(True),
                                   train=False)
        np.testing.assert_allclose(np.asarray(ev0), np.asarray(ev1))
