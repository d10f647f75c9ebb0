"""Profiler-based device timing for microbenches.

Wall-clock scan-chain timing on the axon client carries ~1 ms/iteration of
host/tunnel overhead, flattening every sub-millisecond comparison (measured:
a 0.2 ms-device matmul pair timed 1.15 ms/iter by wall clock).  The only
trustworthy number is the trace's per-op device_duration_ps.
"""

import glob
import gzip
import json
import os
import shutil
from collections import defaultdict

import jax
import jax.numpy as jnp


def device_ms(fn, ops, *, iters=30, tmpdir="/tmp/prof_util", per_op=False):
    """Total leaf-op device ms of one profiled call of ``fn`` chained ``iters``
    times via lax.scan (carry = first operand).  Returns ms per iteration."""

    def chain(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    f = jax.jit(chain)
    float(f(*ops))  # compile + warm
    shutil.rmtree(tmpdir, ignore_errors=True)
    with jax.profiler.trace(tmpdir):
        float(f(*ops))
    return _parse(tmpdir, iters, per_op)


def device_ms_grad(fn, ops, *, iters=30, tmpdir="/tmp/prof_util_g", per_op=False,
                   remat=True):
    """Same for grad of the chained loss wrt (carry, second operand); remat bodies
    so scan residuals stay O(carry).  The timing then contains fwd + (fwd + bwd)
    per iteration."""

    def chain(x, *rest):
        def body(c, _):
            return fn(c, *rest), ()

        if remat:
            body = jax.checkpoint(body)
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    g = jax.jit(jax.grad(chain, argnums=(0, 1)))
    float(jnp.sum(g(*ops)[1]))
    shutil.rmtree(tmpdir, ignore_errors=True)
    with jax.profiler.trace(tmpdir):
        float(jnp.sum(g(*ops)[1]))
    return _parse(tmpdir, iters, per_op)


def _parse(tmpdir, iters, per_op):
    agg = defaultdict(float)
    for t in glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(t, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            args = ev.get("args") or {}
            cat = args.get("hlo_category", "?")
            if "device_duration_ps" not in args or cat == "?":
                continue
            if cat in ("while", "copy-start"):  # wrappers / async starts
                continue
            agg[(cat, ev.get("name", "?"))] += float(args["device_duration_ps"]) / 1e9
    total = sum(agg.values()) / iters
    if per_op:
        ops = sorted(((ms / iters, c, n) for (c, n), ms in agg.items()), reverse=True)
        return total, ops
    return total
