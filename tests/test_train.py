"""Training-layer tests: losses cross-checked against torch (CPU) reference
semantics, AUC against sklearn, optimizer against torch Adam, and a tiny
end-to-end run asserting the loss decreases (SURVEY §4 #5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.train import (
    make_optimizer,
    masked_multitask_auc,
    mse_loss,
    rmse,
    roc_auc,
    weighted_bce_loss,
)


class TestMetrics:
    def test_auc_matches_sklearn(self):
        from sklearn import metrics as skm

        rng = np.random.default_rng(0)
        for _ in range(20):
            n = int(rng.integers(10, 200))
            y = rng.integers(0, 2, n)
            if y.min() == y.max():
                continue
            s = np.round(rng.random(n), 2)  # force ties
            ours = roc_auc(y, s)
            theirs = skm.roc_auc_score(y, s)
            assert abs(ours - theirs) < 1e-12

    def test_auc_single_class_nan(self):
        assert np.isnan(roc_auc(np.ones(5), np.random.rand(5)))

    def test_masked_multitask(self):
        y = np.array([[1, -1], [0, 1], [1, 0], [0, -1]], np.float32)
        p = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.4], [0.1, 0.2]],
                     np.float32)
        aucs, mean = masked_multitask_auc(y, p)
        assert len(aucs) == 2 and not np.isnan(mean)
        # task 1: only rows 1,2 observed -> labels [1, 0], scores [.8, .4]
        assert aucs[1] == 1.0

    def test_rmse(self):
        assert abs(rmse([1, 2, 3], [1, 2, 5]) - np.sqrt(4 / 3)) < 1e-12


class TestLosses:
    def test_mse_matches_torch(self):
        import torch

        rng = np.random.default_rng(1)
        logits = rng.normal(size=(8, 3)).astype(np.float32)
        labels = rng.normal(size=(8, 3)).astype(np.float32)
        ours = float(mse_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.ones(8)))
        theirs = float(torch.nn.MSELoss()(
            torch.tensor(logits).view(-1), torch.tensor(labels).view(-1)
        ))
        assert abs(ours - theirs) < 1e-6

    def test_mse_ignores_padding(self):
        logits = jnp.asarray([[1.0], [100.0]])
        labels = jnp.asarray([[0.0], [0.0]])
        mask = jnp.asarray([1.0, 0.0])
        assert abs(float(mse_loss(logits, labels, mask)) - 1.0) < 1e-6

    def test_weighted_bce_matches_torch(self):
        """Reference loss exactly: per-element weights, sum reduction /
        observed count (`train.py:326-331`)."""
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        B, T = 16, 12
        logits = rng.normal(size=(B, T)).astype(np.float32)
        labels = rng.choice([1.0, 0.0, -1.0], size=(B, T)).astype(np.float32)
        cw = rng.uniform(0.5, 30.0, size=(T, 2)).astype(np.float32)

        ours = float(weighted_bce_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.ones(B),
            jnp.asarray(cw)))

        w = np.zeros((B, T), np.float32)
        for i in range(B):
            for j in range(T):
                if labels[i, j] == 1:
                    w[i, j] = cw[j, 0]
                elif labels[i, j] == 0:
                    w[i, j] = cw[j, 1]
        tl = torch.tensor(labels.clip(0, 1)).view(-1)
        tlog = torch.tensor(logits).view(-1)
        tw = torch.tensor(w).view(-1)
        n_obs = float((labels != -1).sum())
        theirs = float(F.binary_cross_entropy_with_logits(
            tlog, tl, weight=tw, reduction="sum")) / n_obs
        assert abs(ours - theirs) / abs(theirs) < 1e-5


class TestOptimizer:
    def test_adam_matches_torch(self):
        """optax chain == torch.optim.Adam(lr, weight_decay) over 5 steps."""
        import torch

        rng = np.random.default_rng(3)
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
        lr, wd = 1e-3, 1e-2

        # torch
        tw = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            tw.grad = torch.tensor(g)
            opt.step()

        # ours
        tx = make_optimizer(lr, wd)
        params = {"w": jnp.asarray(w0)}
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            import optax

            params = optax.apply_updates(params, upd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
        )


class TestEndToEnd:
    def test_loss_decreases_freesolv(self):
        from eagcn_tpu.train import Experiment
        from eagcn_tpu.utils import benchmark_config
        from eagcn_tpu.utils.logging import RunLogger

        cfg = benchmark_config("freesolv")
        cfg.train.num_epochs = 8
        cfg.train.eval_every_epochs = 100  # skip eval sweeps
        exp = Experiment(cfg, logger=RunLogger(None, "t", echo=False))
        # capture first and last epoch losses
        import numpy as np
        from eagcn_tpu.data import batch_to_jax, iter_batches

        losses = []
        for epoch in range(cfg.train.num_epochs):
            rng = np.random.default_rng([0, epoch])
            ep = []
            for b in iter_batches(exp.ds, exp.train_idx, exp.batch_shape,
                                  shuffle=True, rng=rng):
                (exp.params, exp.state, exp.opt_state, loss) = exp.train_step(
                    exp.params, exp.state, exp.opt_state, batch_to_jax(b),
                    exp.drop_key, np.uint32(exp.global_step),
                )
                ep.append(float(loss))
                exp.global_step += 1
            losses.append(np.mean(ep))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_scan_steps_matches_per_step(self):
        """The chunked lax.scan driver (one dispatch per K steps) must
        produce the same parameters and losses as the per-step path —
        same data order, same fold_in(drop_key, global_step) dropout
        schedule."""
        from eagcn_tpu.train import Experiment
        from eagcn_tpu.utils import benchmark_config
        from eagcn_tpu.utils.logging import RunLogger

        def run(scan_steps):
            cfg = benchmark_config("freesolv")
            cfg.train.num_epochs = 2
            cfg.train.eval_every_epochs = 100
            cfg.train.scan_steps = scan_steps
            exp = Experiment(cfg, logger=RunLogger(None, "t", echo=False))
            exp.run(resume=False)
            return exp.params, exp.global_step

        p_scan, gs_scan = run(5)   # 18 steps/epoch -> 3 chunks + remainder
        p_one, gs_one = run(0)
        assert gs_scan == gs_one
        for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_scan),
            jax.tree_util.tree_leaves_with_path(p_one),
        ):
            np.testing.assert_allclose(
                a, b, rtol=1e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(ka))

    def test_checkpoint_resume_deterministic(self, tmp_path):
        from eagcn_tpu.train import Experiment
        from eagcn_tpu.utils import benchmark_config
        from eagcn_tpu.utils.logging import RunLogger

        def make(ckpt_dir):
            cfg = benchmark_config("freesolv")
            cfg.train.num_epochs = 4
            cfg.train.eval_every_epochs = 100
            cfg.train.checkpoint_every = 2
            return Experiment(cfg, logger=RunLogger(None, "t", echo=False),
                              checkpoint_dir=str(ckpt_dir))

        a = make(tmp_path / "a")
        a.run(resume=False)
        leaves_a = jax.tree_util.tree_leaves(a.params)

        # run 2 epochs, then resume fresh object from the checkpoint
        b1 = make(tmp_path / "b")
        cfg = b1.cfg
        cfg.train.num_epochs = 2
        b1.run(resume=False)
        b2 = make(tmp_path / "b")
        b2.cfg.train.num_epochs = 4
        b2.run(resume=True)
        assert b2.start_epoch == 2
        leaves_b = jax.tree_util.tree_leaves(b2.params)
        for x, y in zip(leaves_a, leaves_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=1e-5)
