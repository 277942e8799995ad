"""The training driver.

Replaces `eagcn_pytorch/train.py:289-478` `train()`: builds data, model and
optimizer from an ExperimentConfig, runs the jitted epoch loop with
per-epoch evaluation, reference-parity early stopping, structured logging,
periodic Orbax checkpoints, and final representation dumps."""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data import (
    FeaturizedDataset,
    batch_to_jax,
    bce_class_weights,
    get_spec,
    iter_batches,
    load_dataset,
    plan_batch_shape,
    train_val_test_split,
)
from ..models import apply_eagcn, init_eagcn
from ..utils.config import ExperimentConfig
from ..utils.logging import RunLogger
from .checkpoint import CheckpointManager
from .metrics import masked_multitask_auc, rmse
from .steps import make_eval_step, make_optimizer, make_train_step


def _prefetch(iterator, depth: int = 2):
    """Host-side pipeline: packs the next batch(es) on a worker thread
    while the device runs the current step (the reference blocks the GPU on
    its Python collate every step, `utils.py:504-640`)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(sentinel)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


class Experiment:
    """One training run.  Usage:
        exp = Experiment(cfg)
        results = exp.run()
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        dataset: Optional[FeaturizedDataset] = None,
        logger: Optional[RunLogger] = None,
        run_name: Optional[str] = None,
        checkpoint_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        t = cfg.train
        self.ds = dataset if dataset is not None else load_dataset(
            get_spec(t.dataset)
        )
        cfg.model.n_bfeat = self.ds.n_bfeat
        cfg.model.n_afeat = self.ds.n_afeat
        cfg.model.n_tasks = self.ds.labels.shape[1]

        self.train_idx, self.val_idx, self.test_idx = train_val_test_split(
            len(self.ds), t.random_state
        )
        sizes, bonds = self.ds.sizes(), np.array(
            [g.num_bonds for g in self.ds.graphs]
        )
        self.n_shards = max(1, int(t.num_data_shards))
        tile = 0
        if cfg.model.backend in ("tile", "pallas"):
            from ..data.batching import pick_tile_size

            tile = pick_tile_size(int(sizes.max()))
        # with DP shards the configured batch size is the GLOBAL batch;
        # each shard packs its round-robin slice into a per-shard budget
        per_shard_mols = -(-t.batch_size // self.n_shards)
        self.batch_shape = plan_batch_shape(
            sizes, bonds, per_shard_mols, tile_size=tile
        )

        self.class_weights = None
        if t.task_type == "class":
            self.class_weights = bce_class_weights(
                self.ds.labels[self.train_idx]
            )

        self.tx = make_optimizer(t.learning_rate, t.weight_decay)
        key = jax.random.key(t.seed)
        self.init_key, _ = jax.random.split(key)
        # dropout keys use the rbg generator: threefry mask generation
        # measured ~30 ms/step on TPU at mega-batch widths; rbg is
        # hardware-cheap and dropout needs no counter-exact reproducibility
        # beyond the seed (init stays threefry for param determinism)
        self.drop_key = jax.random.key(t.seed + 1, impl="rbg")
        self.params, self.state = init_eagcn(self.init_key, cfg.model)
        self.opt_state = self.tx.init(self.params)

        if self.n_shards > 1:
            # data parallelism over a ('data',) mesh: batch leading axis
            # sharded, params replicated, grads + BN moments psum'd
            from ..parallel.dp import make_dp_eval_step, make_dp_train_step
            from ..parallel.mesh import make_mesh

            self.mesh = make_mesh(data=self.n_shards, graph=1)
            self.train_step = make_dp_train_step(
                cfg.model, t.task_type, self.tx, self.mesh,
                self.class_weights,
            )
            self.dp_eval_step = make_dp_eval_step(
                cfg.model, t.task_type, self.mesh
            )
        else:
            self.mesh = None
            # fused single-program step (fwd+bwd+Adam in ONE dispatch) with
            # the dropout fold_in inside the program: measured 7 ms/step
            # async over the remote tunnel vs 34 ms/step for the round-3
            # split-step + host-fold_in path (scripts/probe_dispatch.py)
            self.train_step = make_train_step(
                cfg.model, t.task_type, self.tx, self.class_weights,
                split=False, fold_step=True,
            )
            self.scan_step = None
            if t.scan_steps > 1:
                from .steps import make_scan_step

                self.scan_step = make_scan_step(
                    cfg.model, t.task_type, self.tx, self.class_weights
                )
        # single-device eval path (representation dumps use it even with DP)
        self.eval_step = make_eval_step(cfg.model, t.task_type)

        name = run_name or f"{t.dataset}_{cfg.model.structure}_rs{t.random_state}"
        self.logger = logger or RunLogger(cfg.out_dir, name)
        self.ckpt = (
            CheckpointManager(checkpoint_dir) if checkpoint_dir else None
        )
        self.start_epoch = 0
        self.val_history: List[float] = []
        self.global_step = 0

    # ------------------------------------------------------------------
    def _run_one(self, batch):
        if self.n_shards > 1:
            # DP path folds on host (shard_map program, unchanged)
            step_key = jax.random.fold_in(self.drop_key, self.global_step)
            self.params, self.state, self.opt_state, loss = self.train_step(
                self.params, self.state, self.opt_state,
                batch_to_jax(batch), step_key,
            )
        else:
            # fold_step path: fold_in runs INSIDE the compiled step; a host
            # fold_in here breaks async dispatch pipelining over the remote
            # tunnel (34 -> 10 ms/step, scripts/probe_dispatch.py)
            self.params, self.state, self.opt_state, loss = self.train_step(
                self.params, self.state, self.opt_state,
                batch_to_jax(batch), self.drop_key,
                np.uint32(self.global_step),
            )
        self.global_step += 1
        return loss

    def _run_chunk(self, chunk):
        """K packed batches -> one scanned device call (see
        steps.make_scan_step).  Stacking happens on host numpy; one
        device_put moves the chunk."""
        import jax.numpy as jnp

        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *chunk)
        step_ids = jnp.arange(self.global_step,
                              self.global_step + len(chunk), dtype=jnp.uint32)
        self.params, self.state, self.opt_state, losses = self.scan_step(
            self.params, self.state, self.opt_state, batch_to_jax(stacked),
            step_ids, self.drop_key,
        )
        self.global_step += len(chunk)
        return losses

    # ------------------------------------------------------------------
    def maybe_resume(self) -> bool:
        if self.ckpt is None:
            return False
        payload = self.ckpt.restore()
        if payload is None:
            return False

        def _rebuild(reference, restored):
            # orbax may change container types (tuple->list, list->dict);
            # unflatten restored leaves against the live structure
            leaves, treedef = jax.tree_util.tree_flatten(reference)
            new_leaves = jax.tree_util.tree_leaves(restored)
            assert len(leaves) == len(new_leaves), "checkpoint shape mismatch"
            return jax.tree_util.tree_unflatten(
                treedef, [np.asarray(l) for l in new_leaves]
            )

        self.params = _rebuild(self.params, payload["params"])
        self.state = _rebuild(self.state, payload["state"])
        self.opt_state = _rebuild(self.opt_state, payload["opt_state"])
        self.start_epoch = int(payload["epoch"]) + 1
        self.global_step = int(payload.get("global_step", 0))
        self.val_history = [
            float(v) for v in payload.get("val_history", [])
            if np.isfinite(v)
        ]
        self.logger.write_text(f"resumed from epoch {self.start_epoch}")
        return True

    def _save(self, epoch: int) -> None:
        if self.ckpt is None:
            return
        self.ckpt.save(epoch, {
            "params": self.params,
            "state": self.state,
            "opt_state": self.opt_state,
            "epoch": epoch,
            "global_step": self.global_step,
            # nan sentinel keeps the array non-empty (orbax rejects size-0)
            "val_history": np.asarray(
                self.val_history + [np.nan], dtype=np.float64
            ),
        })

    # ------------------------------------------------------------------
    def _eval_batches(self, indices: np.ndarray):
        """Eval splits are static — pack them once and reuse every epoch,
        with labels/masks kept as HOST arrays (fetching them from device
        every sweep costs a tunnel round trip per batch).  Yields
        (device_batch, host_mol_mask, host_labels).  Large splits (e.g.
        the HIV train split) are streamed instead of cached to bound
        device memory."""
        if len(indices) > 8192:
            return ((batch_to_jax(b), np.asarray(b.mol_mask),
                     np.asarray(b.labels)) for b in
                    iter_batches(self.ds, indices, self.batch_shape))
        key = (int(indices[0]), int(indices[-1]), len(indices))
        cache = getattr(self, "_eval_cache", None)
        if cache is None:
            cache = self._eval_cache = {}
        if key not in cache:
            cache[key] = [
                (batch_to_jax(b), np.asarray(b.mol_mask),
                 np.asarray(b.labels))
                for b in iter_batches(self.ds, indices, self.batch_shape)
            ]
        return cache[key]

    def evaluate(self, indices: np.ndarray) -> Dict:
        """Full sweep -> metric dict (AUC list+mean or RMSE)."""
        preds, trues = [], []
        if self.n_shards > 1:
            from ..parallel.dp import sharded_batch_stream

            for batch in sharded_batch_stream(
                self.ds, indices, self.batch_shape, self.n_shards
            ):
                p, lab, mm = self.dp_eval_step(
                    self.params, self.state, batch_to_jax(batch)
                )
                keep = np.asarray(mm).reshape(-1) > 0
                preds.append(np.asarray(p).reshape(keep.shape[0], -1)[keep])
                trues.append(
                    np.asarray(lab).reshape(keep.shape[0], -1)[keep])
        else:
            keeps = []
            for batch, mol_mask, labels in self._eval_batches(indices):
                p, _, _ = self.eval_step(self.params, self.state, batch)
                # keep results on device so eval dispatches pipeline over
                # the tunnel; one async-batched conversion after the loop
                preds.append(p)
                keeps.append(mol_mask > 0)
                trues.append(labels)
            preds = [np.asarray(p)[k]
                     for p, k in zip(jax.device_get(preds), keeps)]
            trues = [t[k] for t, k in zip(trues, keeps)]
        y_pred = np.concatenate(preds)
        y_true = np.concatenate(trues)
        if self.cfg.train.task_type == "class":
            aucs, mean = masked_multitask_auc(y_true, y_pred)
            return {"auc_per_task": aucs, "auc": mean}
        return {"rmse": rmse(y_true, y_pred)}

    def _early_stop(self, epoch: int, val_metric: float) -> bool:
        """Reference early stopping (`train.py:379-397,417-429`): first 4/5
        of epochs build history; afterwards stop when the current val metric
        beats the mean of the best-30 historical values."""
        t = self.cfg.train
        if epoch < t.num_epochs * t.early_stop_frac:
            self.val_history.append(val_metric)
            return False
        if not self.val_history:
            return False
        hist = sorted(self.val_history)
        if t.task_type == "class":
            best = hist[-t.early_stop_window:]
            return val_metric > float(np.mean(best))
        best = hist[: t.early_stop_window]
        return val_metric < float(np.mean(best))

    # ------------------------------------------------------------------
    def run(self, resume: bool = True) -> Dict:
        t = self.cfg.train
        if resume:
            self.maybe_resume()
        self.logger.log("config", **dataclasses.asdict(self.cfg))
        stop = False
        epoch = max(self.start_epoch - 1, 0)
        for epoch in range(self.start_epoch, t.num_epochs):
            # data order derives from (seed, epoch) for deterministic resume
            epoch_rng = np.random.default_rng([t.seed, epoch])
            t0 = time.time()
            losses = []
            if self.n_shards > 1:
                from ..parallel.dp import sharded_batch_stream

                source = sharded_batch_stream(
                    self.ds, self.train_idx, self.batch_shape,
                    self.n_shards, shuffle=True, rng=epoch_rng,
                )
            else:
                source = iter_batches(
                    self.ds, self.train_idx, self.batch_shape,
                    shuffle=True, rng=epoch_rng,
                )
            batches = _prefetch(source)
            K = t.scan_steps if getattr(self, "scan_step", None) else 0
            if K > 1:
                # chunk K same-shape steps into ONE device dispatch
                chunk: List = []
                for batch in batches:
                    chunk.append(batch)
                    if len(chunk) == K:
                        losses.append(self._run_chunk(chunk))
                        chunk = []
                for batch in chunk:       # remainder: per-step path
                    losses.append(self._run_one(batch))
            else:
                for batch in batches:
                    losses.append(self._run_one(batch))
            # ONE async-batched d2h fetch: converting each device scalar
            # with np.asarray costs a full tunnel round trip PER STEP
            # (~30 ms x ~1000 steps = most of an HIV epoch); device_get
            # issues copy_to_host_async on every leaf before blocking
            losses = jax.device_get(losses)
            mean_loss = float(np.mean(np.concatenate(
                [np.atleast_1d(np.asarray(l)) for l in losses])))
            step_time = time.time() - t0

            if (epoch + 1) % t.eval_every_epochs == 0 or epoch == t.num_epochs - 1:
                val = self.evaluate(self.val_idx)
                test = self.evaluate(self.test_idx)
                key = "auc" if t.task_type == "class" else "rmse"
                self.logger.metrics_line(
                    epoch + 1, t.num_epochs, self.global_step, mean_loss,
                    **{f"Validation {key.upper()}": val[key],
                       f"Test {key.upper()}": test[key],
                       "epoch_s": round(step_time, 2)},
                )
                stop = self._early_stop(epoch, val[key])

            if t.checkpoint_every and (epoch + 1) % t.checkpoint_every == 0:
                self._save(epoch)
            if stop:
                self.logger.write_text(
                    f"{epoch}th epoch: early stop triggered"
                )
                break

        self._save(epoch)
        results = {
            "train": self.evaluate(self.train_idx),
            "val": self.evaluate(self.val_idx),
            "test": self.evaluate(self.test_idx),
            "epochs_run": epoch + 1,
        }
        self.logger.log("final", **{
            k: v for k, v in results.items() if k != "epochs_run"
        })
        key = "auc" if t.task_type == "class" else "rmse"
        self.logger.write_text(
            f"{key.upper()} of the model on the train set: {results['train'][key]:.4f}\n"
            f"{key.upper()} of the model on the val set:   {results['val'][key]:.4f}\n"
            f"{key.upper()} of the model on the test set:  {results['test'][key]:.4f}"
        )
        return results

    # ------------------------------------------------------------------
    def dump_representations(self, out_dir: str) -> None:
        """Parity with `dump_atom_rep` (`train.py:213-287`): saves per-atom
        representations with subtype + molecule index, and per-molecule
        graph representations with labels and predictions, as npz."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        atom_rep, atom_sub, atom_mol = [], [], []
        graph_rep, mol_idx, mol_lab, mol_pred = [], [], [], []
        for batch in iter_batches(self.ds, self.train_idx, self.batch_shape):
            p, atoms, graphs = self.eval_step(
                self.params, self.state, batch_to_jax(batch)
            )
            nm = np.asarray(batch.node_mask) > 0
            atom_rep.append(np.asarray(atoms)[nm])
            atom_sub.append(np.asarray(batch.node_subtype)[nm])
            atom_mol.append(np.asarray(batch.mol_index)[
                np.asarray(batch.node_mol)[nm]])
            mm = np.asarray(batch.mol_mask) > 0
            graph_rep.append(np.asarray(graphs)[mm])
            mol_idx.append(np.asarray(batch.mol_index)[mm])
            mol_lab.append(np.asarray(batch.labels)[mm])
            mol_pred.append(np.asarray(p)[mm])
        np.savez_compressed(
            os.path.join(out_dir, f"{self.cfg.train.dataset}_reps.npz"),
            atom_rep=np.concatenate(atom_rep),
            atom_subtype=np.concatenate(atom_sub),
            atom_mol_index=np.concatenate(atom_mol),
            graph_rep=np.concatenate(graph_rep),
            mol_index=np.concatenate(mol_idx),
            labels=np.concatenate(mol_lab),
            predictions=np.concatenate(mol_pred),
        )
