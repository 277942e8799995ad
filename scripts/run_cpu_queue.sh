#!/bin/bash
# Sequential CPU training queue: waits for any existing freesolv run, then
# trains lipo and tox21 with reference hyperparameters.  Used while the TPU
# tunnel is unavailable; TPU runs supersede these when possible.
set -u
cd /root/repo

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 20; done
fi

run() {
  local name=$1; shift
  echo "=== starting $name $(date) ==="
  python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import json
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.train import Experiment
cfg = benchmark_config('$1')
cfg.out_dir = '/root/repo/runs'
cfg.train.eval_every_epochs = $2
exp = Experiment(cfg, run_name='$name')
res = exp.run(resume=False)
print('FINAL_JSON', json.dumps(res, default=float))
"
}

run lipo_concat_rs0 lipo 5
run tox21_concat_rs0 tox21 1
