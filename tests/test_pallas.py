"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is
exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.ops.pallas_spmm import PallasEllOps, ell_multi_spmm


def _random_ell(rng, n, d, v, f):
    x = rng.random((n, f), dtype=np.float32)
    neigh = rng.integers(0, n, (n, d)).astype(np.int32)
    w = rng.random((n, d, v), dtype=np.float32)
    mask = (rng.random((n, d)) < 0.7).astype(np.float32)
    w = w * mask[:, :, None]
    return x, neigh, w


class TestEllMultiSpmm:
    @pytest.mark.parametrize("n,d,v,f", [
        (256, 6, 5, 128), (512, 6, 5, 24), (1024, 8, 1, 256),
    ])
    def test_matches_xla(self, n, d, v, f):
        rng = np.random.default_rng(0)
        x, neigh, w = _random_ell(rng, n, d, v, f)
        ref = np.einsum("ndv,ndf->nvf", w, x[neigh])
        out = ell_multi_spmm(
            jnp.asarray(x), jnp.asarray(neigh), jnp.asarray(w),
            block_rows=128, feature_tile=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_unaligned_shapes_padded(self):
        rng = np.random.default_rng(1)
        x, neigh, w = _random_ell(rng, 100, 6, 5, 300)
        ref = np.einsum("ndv,ndf->nvf", w, x[neigh])
        out = ell_multi_spmm(jnp.asarray(x), jnp.asarray(neigh),
                             jnp.asarray(w), block_rows=64, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


class TestPallasBackendParity:
    def test_model_forward_matches_ell(self):
        """Full model forward with backend='pallas' (interpret) == 'ell'."""
        from eagcn_tpu.data import BatchShape, batch_to_jax, get_spec, \
            iter_batches, load_dataset
        from eagcn_tpu.models import apply_eagcn, init_eagcn
        from eagcn_tpu.utils import benchmark_config
        import eagcn_tpu.ops.aggregate as agg
        from eagcn_tpu.ops.pallas_spmm import PallasEllOps

        ds = load_dataset(get_spec("freesolv"))
        cfg = benchmark_config("freesolv")
        cfg.model.n_bfeat = ds.n_bfeat
        cfg.model.dropout = 0.0
        shape = BatchShape(num_nodes=256, num_edges=512, num_mols=8)
        batch = batch_to_jax(next(iter_batches(ds, np.arange(8), shape)))
        params, state = init_eagcn(jax.random.key(0), cfg.model)

        outs = {}
        for backend in ("ell", "pallas"):   # pallas auto-interprets on CPU
            cfg.model.backend = backend
            outs[backend] = np.asarray(
                apply_eagcn(params, state, batch, cfg.model)[0])
        np.testing.assert_allclose(outs["pallas"], outs["ell"],
                                   rtol=1e-4, atol=1e-5)
