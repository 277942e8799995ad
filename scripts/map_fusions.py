"""Map hot fusion names from probe_trace.py to their HLO bodies + source
lines (op_name metadata), so byte-reduction work targets the right ops.

Run: python scripts/map_fusions.py fusion.92 convolution_convert_fusion.1 ...
"""
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

import bench
from eagcn_tpu.models import apply_eagcn, init_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss

cfg, graphs, labels, batch, real_edges = bench.build_workload()
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12, 2))
key = jax.random.key(0)


@jax.jit
def full_g(carry):
    p, k = carry
    k, sub = jax.random.split(k)

    def loss(pp):
        logits, _, _, ns = apply_eagcn(pp, state, batch, cfg.model,
                                       train=True, rng=sub)
        return weighted_bce_loss(logits, batch.labels, batch.mol_mask, cw)

    g = jax.grad(loss)(p)
    return (jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), k)


txt = full_g.lower((params, key)).compile().as_text()
names = sys.argv[1:] or ["fusion.92"]

# find the fusion instruction lines and their called computation
fusion_calls = {}
for line in txt.splitlines():
    m = re.search(r"%?([\w.\-]+(?:\.\d+)?) = .*fusion\(.*calls=%?([\w.\-]+)", line)
    if m:
        fusion_calls[m.group(1)] = (m.group(2), line.strip())

# collect computation bodies
bodies = {}
cur = None
for line in txt.splitlines():
    m = re.match(r"^%([\w.\-]+) (?:\([^)]*\) )?->.*{$|^%([\w.\-]+) {$", line)
    if line.rstrip().endswith("{") and (line.startswith("%") or line.startswith("ENTRY")):
        nm = re.match(r"^(?:ENTRY )?%?([\w.\-]+)", line)
        cur = nm.group(1) if nm else None
        bodies[cur] = []
    elif cur is not None:
        if line.strip() == "}":
            cur = None
        else:
            bodies[cur].append(line)

for want in names:
    print("=" * 80)
    print(f"### {want}")
    if want not in fusion_calls:
        # exact name preferred; a bare prefix like 'fusion.9' matches
        # fusion.9/fusion.90/fusion.92..., so list every candidate
        cands = sorted(k for k in fusion_calls if k.startswith(want))
        if not cands:
            print("  not found as fusion; grepping entry for name")
            for line in txt.splitlines():
                if re.search(rf"%{re.escape(want)} = ", line):
                    print("  " + line.strip()[:300])
            continue
        if len(cands) > 1:
            print(f"  prefix matches {len(cands)} fusions: {cands}; "
                  f"showing {cands[0]}")
        want = cands[0]
    comp, call_line = fusion_calls[want]
    print("CALL:", call_line[:300])
    body = bodies.get(comp, [])
    print(f"BODY ({comp}, {len(body)} lines):")
    srcs = set()
    for line in body:
        s = line.strip()
        mm = re.search(r'op_name="([^"]*)"', s)
        sm = re.search(r'source_file="([^"]*)".*source_line=(\d+)', s)
        if mm or sm:
            srcs.add(((mm.group(1) if mm else "?")[:90],
                      f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "?"))
        if len(body) <= 40:
            print("   " + s[:220])
    if len(body) > 40:
        for line in body[:8] + ["   ..."] + body[-8:]:
            print("   " + str(line).strip()[:220] if isinstance(line, str) else line)
    print("SOURCES:")
    for op, src in sorted(srcs):
        print(f"   {src:40s} {op}")
