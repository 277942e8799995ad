"""Command-line driver.

The reference's only entry point is `python train.py --dataset ... --arch ...`
(`eagcn_pytorch/train.py:32-53`); this CLI keeps those flags (plus the
TPU-native ones) on top of the config system:

    python -m eagcn_tpu.cli train --dataset freesolv --arch Concate
    python -m eagcn_tpu.cli featurize --dataset tox21
    python -m eagcn_tpu.cli bench
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_train_args(p: argparse.ArgumentParser) -> None:
    # muv/pcba are registered datasets (data/registry.py) but have no
    # hyperparameter table — the reference defines none either
    # (train.py:61-114), so they are featurize-only here
    p.add_argument("--dataset", default="freesolv",
                   choices=["tox21", "hiv", "nih", "lipo", "esol", "freesolv"])
    p.add_argument("--arch", "-a", default="Concate",
                   choices=["Concate", "Weighted_sum", "GCN", "GAT"])
    p.add_argument("--molfp", default="sum", choices=["sum", "ave", "pool"])
    p.add_argument("--rs", "--random_state", dest="rs", default=0, type=int)
    p.add_argument("-b", "--batch-size", default=32, type=int)
    p.add_argument("--dr", "--dropout-rate", dest="dr", default=0.3, type=float)
    p.add_argument("--epochs", default=None, type=int,
                   help="override the benchmark epoch count")
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--backend", default="ell",
                   choices=["ell", "tile", "coo", "pallas"])
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations through the graph layers")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint each graph layer (memory for FLOPs)")
    p.add_argument("--bn-count-padding", action="store_true",
                   help="A/B: node-level BN statistics count B*max(mol "
                        "size) rows (the reference's padded-collate "
                        "denominator) instead of real atoms only")
    p.add_argument("--scan-steps", default=0, type=int,
                   help="lax.scan K train steps per device dispatch "
                        "(amortizes remote-dispatch overhead)")
    p.add_argument("--shards", default=1, type=int,
                   help="data-parallel shards over a ('data',) device mesh; "
                        "--batch-size is the GLOBAL batch")
    p.add_argument("--out-dir", default="runs")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", default=0, type=int)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dump-reps", action="store_true",
                   help="dump atom/molecule representations after training")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of a few steps")


def cmd_train(args) -> int:
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from .train import Experiment
    from .utils.config import benchmark_config

    cfg = benchmark_config(
        args.dataset, structure=args.arch, batch_size=args.batch_size,
        random_state=args.rs, dropout=args.dr,
    )
    cfg.model.molfp_mode = args.molfp
    cfg.model.backend = args.backend
    cfg.model.bf16 = args.bf16
    cfg.model.remat = args.remat
    cfg.model.bn_count_padding = args.bn_count_padding
    cfg.train.num_data_shards = args.shards
    cfg.train.scan_steps = args.scan_steps
    cfg.out_dir = args.out_dir
    if args.epochs is not None:
        cfg.train.num_epochs = args.epochs
    if args.lr is not None:
        cfg.train.learning_rate = args.lr
    cfg.train.checkpoint_every = args.checkpoint_every

    exp = Experiment(cfg, checkpoint_dir=args.checkpoint_dir)
    if args.profile_dir:
        from .train.profiling import trace_steps

        trace_steps(exp, args.profile_dir)
    results = exp.run(resume=args.resume)
    if args.dump_reps:
        exp.dump_representations(cfg.out_dir)
    print(json.dumps({"dataset": args.dataset, "arch": args.arch,
                      **{k: v for k, v in results.items()}}, default=float))
    return 0


def cmd_featurize(args) -> int:
    from .data import get_spec, load_dataset

    ds = load_dataset(get_spec(args.dataset), use_cache=not args.no_cache)
    sizes = ds.sizes()
    print(json.dumps({
        "dataset": args.dataset,
        "molecules": len(ds),
        "n_bfeat": ds.n_bfeat,
        "bond_types": ds.bondtype_list,
        "skip_stats": ds.skip_stats,
        "atoms_mean": float(sizes.mean()),
        "atoms_max": int(sizes.max()),
    }))
    return 0


def cmd_bench(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="eagcn_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="train a benchmark")
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_feat = sub.add_parser("featurize", help="featurize + cache a dataset")
    p_feat.add_argument("--dataset", required=True)
    p_feat.add_argument("--no-cache", action="store_true")
    p_feat.set_defaults(fn=cmd_featurize)

    p_bench = sub.add_parser("bench", help="run the benchmark harness")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
