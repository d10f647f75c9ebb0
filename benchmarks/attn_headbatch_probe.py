#!/usr/bin/env python3
"""Probe: head-batched MXU dots in the fused window-attention FORWARD.

The production kernel loops over heads, each QK^T / AV a window-batched
(wblk, ws, hd) dot (ops/window_attention.py _attn_fwd_body).  Hypothesis from
docs/PERFORMANCE.md "remaining headroom": a hand-scheduled / batched variant of
the per-head dot sequence could pipeline the MXU better.  Variants:

  loop     production per-head loop (baseline)
  hb_qk    ONE dot_general with batch dims ((0,2),(0,2)) on (wblk, ws, h, hd)
           reshapes -> (wblk, h, ws, ws) scores; wide softmax over all heads;
           per-head AV from p slices
  hb_full  fully batched: batched QK + batched AV -> (wblk, h, ws, hd), then a
           (h, ws) transpose + reshape for the (wblk, ws, C) output write
  hb_t     heads folded into the single window-batch dim via explicit transposes:
           (wblk, ws, h, hd) -> (wblk*h, ws, hd), ONE single-batch-dim QK and AV
           dot each, output transposed back (Mosaic rejects multi-batch-dim dots,
           so this is the only expressible head-batched form)

Cosine flavor (paper config).  Forward-only pallas_call per variant, timed by
trace device time at the three fused-qkv stage shapes.

Usage: python benchmarks/attn_headbatch_probe.py [stage_indices...]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.prof_util import device_ms
from heal_swin_tpu.ops.window_attention import (
    _attn_fwd_body,
    _cos_fold,
    _mask_from_groups,
    _shift_bias,
)

_HB_QK = (((3,), (3,)), ((0, 2), (0, 2)))  # (w,i,h,d)x(w,j,h,d) -> (w,h,i,j)
_HB_AV = (((3,), (1,)), ((0, 1), (0, 2)))  # (w,h,i,j)x(w,j,h,d) -> (w,h,i,d)


def _fwd_body_hb(qkv, mask, bias_ref, scale_ref, out_ref, *, C, h, full):
    """Head-batched cosine forward body (see module docstring)."""
    hd = C // h
    wblk, ws = qkv.shape[0], qkv.shape[1]
    scale_vec = scale_ref[...][:, 0]
    q_hat, k_hat, _ = _cos_fold(qkv, C, h, scale_vec, qkv.dtype)
    q4 = q_hat.reshape(wblk, ws, h, hd)
    k4 = k_hat.reshape(wblk, ws, h, hd)
    s = jax.lax.dot_general(q4, k4, _HB_QK, preferred_element_type=jnp.float32)
    s = s + bias_ref[...][None]  # (wblk, h, ws, ws); bias pre-shifted
    if mask is not None:
        s = s + mask[:, None]
    e = jnp.exp(s)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    if full:
        v4 = qkv[:, :, 2 * C:].reshape(wblk, ws, h, hd)
        o = jax.lax.dot_general(p.astype(qkv.dtype), v4, _HB_AV,
                                preferred_element_type=jnp.float32)
        o = jnp.transpose(o, (0, 2, 1, 3)).reshape(wblk, ws, C)
        out_ref[...] = o.astype(out_ref.dtype)
    else:
        for head in range(h):
            v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
            o = jax.lax.dot_general(
                p[:, head].astype(v.dtype), v,
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)


def _fwd_body_hb_t(qkv, mask, bias_ref, scale_ref, out_ref, *, C, h):
    """Heads folded into the window-batch dim via explicit transposes."""
    hd = C // h
    wblk, ws = qkv.shape[0], qkv.shape[1]
    scale_vec = scale_ref[...][:, 0]
    q_hat, k_hat, _ = _cos_fold(qkv, C, h, scale_vec, qkv.dtype)

    def fold(t):  # (wblk, ws, C) -> (wblk*h, ws, hd)
        t4 = t.reshape(wblk, ws, h, hd)
        return jnp.transpose(t4, (0, 2, 1, 3)).reshape(wblk * h, ws, hd)

    qf = fold(q_hat)
    kf = fold(k_hat)
    vf = fold(qkv[:, :, 2 * C:])
    s = jax.lax.dot_general(qf, kf, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (wblk*h, ws, ws)
    s = s.reshape(wblk, h, ws, ws) + bias_ref[...][None]
    if mask is not None:
        s = s + mask[:, None]
    s = s.reshape(wblk * h, ws, ws)
    e = jnp.exp(s)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(p.astype(vf.dtype), vf, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (wblk*h, ws, hd)
    o = jnp.transpose(o.reshape(wblk, h, ws, hd), (0, 2, 1, 3)).reshape(wblk, ws, C)
    out_ref[...] = o.astype(out_ref.dtype)


def _kernel(gcol_ref, grow_ref, x_ref, w_ref, bias_ref, scale_ref, out_ref, *,
            C, h, variant):
    qkv = jax.lax.dot_general(x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32).astype(x_ref.dtype)
    mask = _mask_from_groups(gcol_ref, grow_ref, True)
    if variant == "loop":
        _attn_fwd_body(qkv, mask, bias_ref, scale_ref, out_ref, C=C, h=h,
                       use_cos=True, has_bias=True, sm_scale=0.0)
    elif variant == "hb_t":
        _fwd_body_hb_t(qkv, mask, bias_ref, scale_ref, out_ref, C=C, h=h)
    else:
        _fwd_body_hb(qkv, mask, bias_ref, scale_ref, out_ref, C=C, h=h,
                     full=(variant == "hb_full"))


def make_fwd(ws, C, h, wblk, variant, dtype=jnp.bfloat16):
    def run(x, wqkv, groups, bias, logit_scale):
        T = x.shape[0]
        nw = T // ws
        g = groups.astype(jnp.int32)
        bias_s = _shift_bias(bias, logit_scale, True, True)
        kern = functools.partial(_kernel, C=C, h=h, variant=variant)
        out = pl.pallas_call(
            kern,
            grid=(nw // wblk,),
            in_specs=[
                pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nw, ws, C), dtype),
        )(g.reshape(nw, ws, 1), g.reshape(nw, 1, ws), x.reshape(nw, ws, C),
          wqkv, bias_s, logit_scale.reshape(h, 1).astype(jnp.float32))
        return out.reshape(T, C)

    return run


B = 2
WS = 64
STAGES = [
    (131072, 96, 3, 16),
    (32768, 192, 6, 16),
    (8192, 384, 12, 16),
]

if __name__ == "__main__":
    which = [int(a) for a in sys.argv[1:]] or list(range(len(STAGES)))
    rng = np.random.RandomState(0)
    for si in which:
        tokens, C, h, wblk = STAGES[si]
        T = B * tokens
        nw = T // WS
        x = jnp.asarray(rng.randn(T, C), jnp.bfloat16)
        wqkv = jnp.asarray(rng.randn(C, 3 * C) * 0.05, jnp.bfloat16)
        groups = jnp.asarray(rng.randint(0, 3, (nw, WS)), jnp.int32)
        bias = jnp.asarray(rng.randn(h, WS, WS) * 0.02, jnp.float32)
        ls = jnp.asarray(np.full(h, 8.0), jnp.float32)
        ops = (x, wqkv, groups, bias, ls)

        row = {"stage": si, "T": T, "C": C, "h": h, "wblk": wblk}
        ref = None
        for variant in ("loop", "hb_qk", "hb_full", "hb_t"):
            try:
                fn = make_fwd(WS, C, h, wblk, variant)
                out = np.asarray(fn(*ops), dtype=np.float32)
                if ref is None:
                    ref = out
                    err = 0.0
                else:
                    err = float(np.max(np.abs(out - ref)))
                row[variant + "_ms"] = round(device_ms(fn, ops), 3)
                row[variant + "_maxerr"] = round(err, 6)
            except Exception as e:  # Mosaic may reject multi-batch-dim dots
                row[variant + "_err"] = repr(e)[:160]
        print(json.dumps(row), flush=True)
