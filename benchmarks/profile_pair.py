#!/usr/bin/env python3
"""Device-trace profile of one matmul round-trip pair under scan."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

M, K, N = [int(v) for v in sys.argv[1:4]] if len(sys.argv) > 3 else (4096, 768, 3072)
ITERS = 30

rng = np.random.RandomState(0)
a = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
b1 = jnp.asarray(rng.randn(K, N) * 0.05, jnp.bfloat16)
b2 = jnp.asarray(rng.randn(N, K) * 0.05, jnp.bfloat16)


@jax.jit
def chain(a, b1, b2):
    def body(c, _):
        o = jax.lax.dot_general(c, b1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        c2 = jax.lax.dot_general(o.astype(c.dtype), b2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return c2.astype(c.dtype), ()

    c, _ = jax.lax.scan(body, a, None, length=ITERS)
    return jnp.sum(c.astype(jnp.float32))


float(chain(a, b1, b2))
outdir = "/tmp/pairprof"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    float(chain(a, b1, b2))

traces = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
print("traces:", traces, file=sys.stderr)
agg = defaultdict(lambda: [0.0, 0])
for t in traces:
    with gzip.open(t, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        args = ev.get("args") or {}
        if "device_duration_ps" in args and args.get("hlo_category", "?") != "?":
            cat = args.get("hlo_category")
            name = ev.get("name", "?")
            agg[(cat, name)][0] += float(args["device_duration_ps"]) / 1e9
            agg[(cat, name)][1] += 1
for (cat, name), (ms, n) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:15]:
    print(json.dumps({"cat": cat, "op": name[:60], "total_ms": round(ms, 3),
                      "count": n}))
print(json.dumps({"total_device_ms": round(sum(v[0] for v in agg.values()), 3)}))
