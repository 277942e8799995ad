#!/bin/bash
# Pre-snapshot gate (round-4 postmortem: a snapshot shipped with 5
# failing tests because the suite wasn't run).  Run before any
# end-of-round commit:
#
#   bash scripts/preflight.sh
#
# Green = full suite passes on the 8-device CPU mesh AND the driver's
# multichip dryrun compiles + executes with loss parity.
set -euo pipefail
cd /root/repo

echo "== pytest (8-device CPU mesh) =="
python -m pytest tests/ -x -q

echo "== dryrun_multichip(8) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== entry() compile check =="
XLA_FLAGS=--xla_force_host_platform_device_count=1 JAX_PLATFORMS=cpu \
    python -c "
import __graft_entry__ as g
import jax
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print('entry ok', out.shape)
"
echo "PREFLIGHT GREEN"
