#!/bin/bash
set -u
cd /root/repo
wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 30; done
fi
run() {
  local name=$1 dsn=$2 arch=$3 every=$4
  echo "=== starting $name $(date) ==="
  python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import json
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.train import Experiment
cfg = benchmark_config('$dsn', structure='$arch')
cfg.out_dir = '/root/repo/runs'
cfg.train.eval_every_epochs = $every
exp = Experiment(cfg, run_name='$name')
res = exp.run(resume=False)
print('FINAL_JSON $name', json.dumps(res, default=float))
"
}
run freesolv_weighted_rs0 freesolv Weighted_sum 10
run lipo_concat_rs0 lipo Concate 5
