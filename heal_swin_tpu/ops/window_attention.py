"""Fused window multi-head self-attention (Pallas TPU kernel).

The XLA path materializes the (B, nW, h, ws, ws) attention scores in f32 in HBM
(plus layout copies around the qkv reshape) — ~1/3 of the train step at paper scale.
This kernel keeps the whole window attention VMEM-resident: per grid step it loads a
block of wblk windows' fused qkv rows ((wblk, ws, 3C), exactly the dense layer's output
layout — no transpose), computes per-head QK^T as a window-batched MXU dot
((wblk, ws, hd) x (wblk, ws, hd) -> (wblk, ws, ws)), adds the shift mask (derived
in-kernel from integer group ids) and the relative-position bias, softmaxes in f32,
applies AV and writes (wblk, ws, C).  Window-batched dots do exactly the required
FLOPs — no block-diagonal padding waste.  Supports both attention flavors of the
reference: scaled dot product and SWIN-v2 cosine attention with clamped logit scale
(reference swin_hp_transformer.py:124-174).

Backward: a second Pallas kernel (flash style) that saves only qkv/groups/bias from
the forward, recomputes the softmax in VMEM and emits dqkv plus grid-accumulated
dbias / dlogit_scale.  `reference_window_attention` is the identical jnp math, used as
the numerical oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heal_swin_tpu.ops.vma_util import with_vma

MASK_VALUE = -100.0

_BATCH_QK = (((2,), (2,)), ((0,), (0,)))  # (w,i,d)x(w,j,d) -> (w,i,j)
_BATCH_AV = (((2,), (1,)), ((0,), (0,)))  # (w,i,j)x(w,j,d) -> (w,i,d)
_BATCH_TN = (((1,), (1,)), ((0,), (0,)))  # (w,i,j)x(w,i,d) -> (w,j,d)  (transpose-first)
_ROWS = (((1,), (0,)), ((), ()))  # (m,k)x(k,n) -> (m,n)


def _cos_fold(qkv, C, h, scale_vec, dtype):
    """Fold the cosine-attention q/k L2 normalization into full-width ops.

    Per-head normalization on (wblk, ws, hd=32) slices runs ~10 narrow VPU passes per
    head and profiled at 34% of the forward kernel (benchmarks/attn_ablate.py).  Here
    the per-head inverse norms for ALL heads come from one wide square + a tiny
    0/1-indicator matmul, are expanded back to full width by a second tiny matmul
    (with the per-head logit scale folded into the q side), and applied as two wide
    multiplies.  Returns (q_hat, k_hat, inv):
      q_hat = q * scale_h / |q|_head   (low precision, (wblk, ws, C))
      k_hat = k / |k|_head
      inv   = (wblk, ws, 2h) f32: [1/|q| per head, 1/|k| per head]
    so dot(q_hat, k_hat) == scale_h * cos(q, k) exactly as the reference computes it
    (swin_hp_transformer.py:142-147), up to bf16 rounding placement.
    """
    hd = C // h
    wblk, ws = qkv.shape[0], qkv.shape[1]
    qf = qkv[:, :, :C].astype(jnp.float32)
    kf = qkv[:, :, C:2 * C].astype(jnp.float32)
    sq = qkv[:, :, :2 * C].astype(jnp.float32)
    sq = sq * sq
    rows = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 0) // hd
    cols = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 1)
    ind = (rows == cols).astype(jnp.float32)
    ss = jax.lax.dot_general(
        sq.reshape(wblk * ws, 2 * C), ind, _ROWS, preferred_element_type=jnp.float32
    )
    inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))  # (wblk*ws, 2h)
    inv_qs = inv[:, :h] * scale_vec[None, :]
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (h, C), 0)
    cols_c = jax.lax.broadcasted_iota(jnp.int32, (h, C), 1) // hd
    ind_t = (rows_c == cols_c).astype(jnp.float32)
    exp_q = jax.lax.dot_general(
        inv_qs, ind_t, _ROWS, preferred_element_type=jnp.float32
    ).reshape(wblk, ws, C)
    exp_k = jax.lax.dot_general(
        inv[:, h:], ind_t, _ROWS, preferred_element_type=jnp.float32
    ).reshape(wblk, ws, C)
    q_hat = (qf * exp_q).astype(dtype)
    k_hat = (kf * exp_k).astype(dtype)
    return q_hat, k_hat, inv.reshape(wblk, ws, 2 * h)


def reference_window_attention(qkv, groups, bias, logit_scale, *, ws, num_heads,
                               use_cos, sm_scale, has_mask=True):
    """Pure-jnp window attention on the kernel's operand layout.

    qkv: (T, 3C) rows of fused q|k|v for T = B*nW*ws tokens (windows contiguous);
    groups: (T//ws, ws) int32 mask group ids; bias: (h, ws, ws) f32 (ignored if all
    zeros is desired — pass zeros); logit_scale: (h,) f32 (already exp(clamp(.))).
    Returns (T, C)."""
    T, C3 = qkv.shape
    C = C3 // 3
    h = num_heads
    hd = C // h
    nw = T // ws
    x = qkv.reshape(nw, ws, 3, h, hd)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (nw, ws, h, hd)
    if use_cos:
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        q = qf * jax.lax.rsqrt(jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
        k = kf * jax.lax.rsqrt(jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
        s = jnp.einsum("wihd,wjhd->whij", q, k, preferred_element_type=jnp.float32)
        s = s * logit_scale[None, :, None, None]
    else:
        s = jnp.einsum("wihd,wjhd->whij", q, k, preferred_element_type=jnp.float32)
        s = s * sm_scale
    s = s + bias[None]
    if has_mask:
        g = groups.astype(jnp.int32)
        mask = jnp.where(g[:, :, None] != g[:, None, :], MASK_VALUE, 0.0)
        s = s + mask[:, None]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    o = jnp.einsum("whij,wjhd->wihd", p, v)
    return o.reshape(T, C).astype(qkv.dtype)


def _shift_bias(bias, logit_scale, use_cos, has_bias):
    """Pre-shift the rel-pos bias by -(max(bias) + scale) for the cosine kernels'
    static-bound softmax, hoisting the per-grid-step max reduce out of the kernel.
    Exact: softmax is shift-invariant, and the true dbias equals the kernel's
    sum-of-ds (row sums of ds are identically zero, so the shift carries no
    gradient)."""
    if use_cos and has_bias:
        h = bias.shape[0]
        return bias - (jnp.max(bias, axis=(1, 2), keepdims=True)
                       + logit_scale.reshape(h, 1, 1))
    return bias


def _mask_from_groups(gcol_ref, grow_ref, has_mask):
    if not has_mask:
        return None
    gc = gcol_ref[...]  # (wblk, ws, 1)
    gr = grow_ref[...]  # (wblk, 1, ws)
    return jnp.where(gc != gr, MASK_VALUE, 0.0).astype(jnp.float32)  # (wblk, ws, ws)


def _attn_fwd_body(qkv, mask, bias_ref, scale_ref, out_ref, *, C, h, use_cos,
                   has_bias, sm_scale):
    """Window-batched attention on a (wblk, ws, 3C) qkv block; each head's QK^T / AV
    is one batched MXU dot over the wblk windows — exact per-window math, zero
    padding FLOPs.

    Cosine flavor: q/k normalization folded into wide ops (_cos_fold), and since
    dot(q_hat, k_hat) <= scale the softmax uses the STATIC shift scale + max(bias)
    instead of a per-row max reduce (exact — softmax is shift invariant; exp cannot
    overflow because s - shift <= 0)."""
    hd = C // h
    if use_cos:
        scale_vec = scale_ref[...][:, 0]  # (h,) f32
        q_hat, k_hat, _ = _cos_fold(qkv, C, h, scale_vec, qkv.dtype)
    for head in range(h):
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        if use_cos:
            q = q_hat[:, :, head * hd:(head + 1) * hd]
            k = k_hat[:, :, head * hd:(head + 1) * hd]
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            if has_bias:
                # bias arrives pre-shifted by -(max(bias) + scale) (see _shift_bias)
                s = s + bias_ref[head][None]
            else:
                s = s - scale_vec[head]
            if mask is not None:
                s = s + mask
        else:
            q = qkv[:, :, head * hd:(head + 1) * hd]
            k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
            if has_bias:
                s = s + bias_ref[head][None]
            if mask is not None:
                s = s + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        # Clamp: with the cosine static-bound shift a row whose logits are all
        # very negative can underflow e to 0 row-wide; tiny floor avoids 0/0 NaN.
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=jnp.float32
        )
        out_ref[:, :, head * hd:(head + 1) * hd] = o.astype(out_ref.dtype)


def _fwd_kernel(gcol_ref, grow_ref, qkv_ref, bias_ref, scale_ref, out_ref, *, ws, C,
                h, wblk, use_cos, has_bias, has_mask, sm_scale):
    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    _attn_fwd_body(qkv_ref[...], mask, bias_ref, scale_ref, out_ref, C=C, h=h,
                   use_cos=use_cos, has_bias=has_bias, sm_scale=sm_scale)


def _float0_like(x):
    return jax.tree.map(lambda v: jnp.zeros(v.shape, dtype=jax.dtypes.float0), x)


def _attn_bwd_body_cos_wide(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref,
                            dbias_ref, dls_ref, aq_ref, bk_ref, *, C, h, has_bias):
    """Fully-wide cosine backward: per-head work is ONLY the 6 MXU dots; all q/k
    normalization and tangent-projection elementwise math runs at full C width, with
    the per-head row-reductions (|q|, |k|, <dq_hat, q_hat>) as tiny 0/1-indicator
    matmuls — the backward analogue of the forward's _cos_fold.  The per-head dq_hat
    / dk_hat dot outputs land in f32 VMEM scratch (aq_ref / bk_ref) so the tangent
    epilogue is two wide passes.  Measured (benchmarks/attn_bwd_parts.py): stage-0
    bwd 4.36 -> 3.40 ms, C=384 3.42 -> 2.12 ms (at its VMEM-fitting block).

    Algebra per head (scale s_h, u = 1/|q| rows, q_hat = q*u):
      A = ds . k_hat          (unscaled)   => dq = s_h*u*(A - q_hat<A, q_hat>)
      B = ds^T . (q_hat*s_h)  (scale-folded) => dk = v  *(B - k_hat<B, k_hat>)
    """
    pre = _cos_wide_preamble(qkv, C, h, scale_ref[...][:, 0])
    for head in range(h):
        do = dout_ref[:, :, head * (C // h):(head + 1) * (C // h)]
        _cos_wide_head_bwd(qkv, mask, bias_ref, scale_ref, do, dqkv_ref, dbias_ref,
                           aq_ref, bk_ref, pre, head, C=C, h=h, has_bias=has_bias)
    _cos_wide_tangent(aq_ref, bk_ref, pre, dqkv_ref, dls_ref, C=C, h=h)


def _cos_wide_preamble(qkv, C, h, scale_vec):
    """Wide f32 normalized q/k operands + per-head inverse norms for the wide cosine
    backward (see _attn_bwd_body_cos_wide docstring)."""
    f32 = jnp.float32
    hd = C // h
    wblk, ws = qkv.shape[0], qkv.shape[1]
    rows = wblk * ws
    qf = qkv[:, :, :C].astype(f32)
    kf = qkv[:, :, C:2 * C].astype(f32)
    sq = qkv[:, :, :2 * C].astype(f32)
    sq = sq * sq
    r2 = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 0) // hd
    c2 = jax.lax.broadcasted_iota(jnp.int32, (2 * C, 2 * h), 1)
    ind2 = (r2 == c2).astype(f32)  # (2C, 2h)
    ss = jax.lax.dot_general(sq.reshape(rows, 2 * C), ind2, _ROWS,
                             preferred_element_type=f32)
    inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-24))  # (rows, 2h)
    rc = jax.lax.broadcasted_iota(jnp.int32, (h, C), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, C), 1) // hd
    indt = (rc == cc).astype(f32)  # (h, C)
    uk_exp = jax.lax.dot_general(inv[:, h:], indt, _ROWS,
                                 preferred_element_type=f32).reshape(wblk, ws, C)
    uq_exp = jax.lax.dot_general(inv[:, :h], indt, _ROWS,
                                 preferred_element_type=f32).reshape(wblk, ws, C)
    qhat = qf * uq_exp  # (wblk, ws, C) f32, unscaled normalized
    khat = kf * uk_exp
    scale_row = jax.lax.dot_general(scale_vec.reshape(1, h), indt, _ROWS,
                                    preferred_element_type=f32)  # (1, C)
    qhat_s = (qhat * scale_row[None]).astype(qkv.dtype)  # scale folded, low precision
    khat_lo = khat.astype(qkv.dtype)
    return dict(inv=inv, indt=indt, uk_exp=uk_exp, qhat=qhat, khat=khat,
                qhat_s=qhat_s, khat_lo=khat_lo, scale_vec=scale_vec)


def _cos_wide_softmax(qkv, mask, bias_ref, scale_ref, pre, head, *, C, h, has_bias):
    """Per-head probabilities (f32) from the wide preamble's folded operands."""
    hd = C // h
    sl = slice(head * hd, (head + 1) * hd)
    s_dot = jax.lax.dot_general(pre["qhat_s"][:, :, sl], pre["khat_lo"][:, :, sl],
                                _BATCH_QK, preferred_element_type=jnp.float32)
    if has_bias:
        # bias arrives pre-shifted by -(max(bias) + scale) (see _shift_bias)
        s = s_dot + bias_ref[head][None]
    else:
        s = s_dot - scale_ref[head, 0]
    if mask is not None:
        s = s + mask
    e = jnp.exp(s)
    # Same underflow clamp as the forward (static-bound softmax rows can be all-0).
    return s_dot, e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def _cos_wide_head_bwd(qkv, mask, bias_ref, scale_ref, do, dqkv_ref, dbias_ref,
                       aq_ref, bk_ref, pre, head, *, C, h, has_bias, p=None):
    """dv / dbias / tangent-dot inputs for one head.  Pass a precomputed p to skip
    the softmax recompute (the epilogue-fused backward caches it).  dlogit_scale
    needs no score recompute at all: dls_h = sum_ij ds_ij <qhat_i, khat_j>
    = sum_i <aq_i, qhat_i>, and _cos_wide_tangent already reduces exactly those
    per-head row sums (rdq) for the tangent projection — it accumulates dls there."""
    f32 = jnp.float32
    hd = C // h
    sl = slice(head * hd, (head + 1) * hd)
    v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
    if p is None:
        _, p = _cos_wide_softmax(qkv, mask, bias_ref, scale_ref, pre, head,
                                 C=C, h=h, has_bias=has_bias)
    p_lo = p.astype(v.dtype)
    dv = jax.lax.dot_general(p_lo, do, _BATCH_TN, preferred_element_type=f32)
    dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(
        dqkv_ref.dtype)
    dp = jax.lax.dot_general(do, v, _BATCH_QK, preferred_element_type=f32)
    t = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - t)
    if has_bias:
        dbias_ref[head] += jnp.sum(ds, axis=0)
    ds_lo = ds.astype(qkv.dtype)
    aq_ref[:, :, sl] = jax.lax.dot_general(ds_lo, pre["khat_lo"][:, :, sl],
                                           _BATCH_AV, preferred_element_type=f32)
    bk_ref[:, :, sl] = jax.lax.dot_general(ds_lo, pre["qhat_s"][:, :, sl],
                                           _BATCH_TN, preferred_element_type=f32)


def _cos_wide_tangent(aq_ref, bk_ref, pre, dqkv_ref, dls_ref, *, C, h):
    """Wide tangent-projection epilogue: dq/dk from the accumulated per-head dots.
    Also accumulates dlogit_scale: dls_h = sum_i <aq_i, qhat_i> over the block's
    rows, which is exactly the column sum of the rdq reduction computed here anyway
    (saves the epilogue backward a per-head score recompute dot)."""
    f32 = jnp.float32
    qhat, khat, inv, indt = pre["qhat"], pre["khat"], pre["inv"], pre["indt"]
    wblk, ws = qhat.shape[0], qhat.shape[1]
    rows = wblk * ws
    ind_ch = jnp.transpose(indt)  # (C, h)
    aq = aq_ref[...]
    rdq = jax.lax.dot_general((aq * qhat).reshape(rows, C), ind_ch, _ROWS,
                              preferred_element_type=f32)  # (rows, h)
    dls_col = jnp.sum(rdq, axis=0)  # (h,)
    for head in range(h):
        dls_ref[head, 0] += dls_col[head]
    rdq_exp = jax.lax.dot_general(rdq, indt, _ROWS,
                                  preferred_element_type=f32).reshape(wblk, ws, C)
    suq = inv[:, :h] * pre["scale_vec"][None, :]
    suq_exp = jax.lax.dot_general(suq, indt, _ROWS,
                                  preferred_element_type=f32).reshape(wblk, ws, C)
    dqkv_ref[:, :, :C] = ((aq - qhat * rdq_exp) * suq_exp).astype(dqkv_ref.dtype)
    bk = bk_ref[...]
    rdk = jax.lax.dot_general((bk * khat).reshape(rows, C), ind_ch, _ROWS,
                              preferred_element_type=f32)
    rdk_exp = jax.lax.dot_general(rdk, indt, _ROWS,
                                  preferred_element_type=f32).reshape(wblk, ws, C)
    dqkv_ref[:, :, C:2 * C] = ((bk - khat * rdk_exp) * pre["uk_exp"]).astype(
        dqkv_ref.dtype)


def _attn_bwd_body(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref,
                   dls_ref, *, C, h, use_cos, has_bias, sm_scale):
    """Flash-style backward on a (wblk, ws, 3C) qkv block: recomputes the softmax in
    VMEM and writes dqkv; dbias (h, ws, ws) and dlogit_scale (h, 1) accumulate across
    the sequential grid into constant-index output blocks.  All dots window-batched.

    Cosine flavor: per-head normalization as in the reference backward (the wide
    _cos_fold preamble does NOT pay for itself here — the tangent projection needs
    the per-head f32 normalized operands anyway; measured on chip), but the softmax
    uses the static bound shift scale + max(bias) like the forward (exact, saves the
    per-row max reduce)."""
    hd = C // h
    for head in range(h):
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        do = dout_ref[:, :, head * hd:(head + 1) * hd]

        if use_cos:
            scale = scale_ref[head, 0]
            qf = qkv[:, :, head * hd:(head + 1) * hd].astype(jnp.float32)
            kf = qkv[:, :, C + head * hd:C + (head + 1) * hd].astype(jnp.float32)
            inv_nq = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(qf * qf, -1, keepdims=True), 1e-24))
            inv_nk = jax.lax.rsqrt(
                jnp.maximum(jnp.sum(kf * kf, -1, keepdims=True), 1e-24))
            qh = (qf * inv_nq).astype(qkv.dtype)
            kh = (kf * inv_nk).astype(qkv.dtype)
            s_hat = jax.lax.dot_general(
                qh, kh, _BATCH_QK, preferred_element_type=jnp.float32
            )
            if has_bias:
                bias_h = bias_ref[head]
                s = s_hat * scale + (bias_h - (jnp.max(bias_h) + scale))[None]
            else:
                s = (s_hat - 1.0) * scale
            if mask is not None:
                s = s + mask
        else:
            q = qkv[:, :, head * hd:(head + 1) * hd]
            k = qkv[:, :, C + head * hd:C + (head + 1) * hd]
            s = jax.lax.dot_general(q, k, _BATCH_QK, preferred_element_type=jnp.float32)
            s = s * sm_scale
            if has_bias:
                s = s + bias_ref[head][None]
            if mask is not None:
                s = s + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        # Clamp: with the cosine static-bound shift a row whose logits are all
        # very negative can underflow e to 0 row-wide; tiny floor avoids 0/0 NaN.
        p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)

        p_lo = p.astype(v.dtype)
        # dV[w] = P[w]^T dO[w]
        dv = jax.lax.dot_general(p_lo, do, _BATCH_TN, preferred_element_type=jnp.float32)
        dqkv_ref[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd] = dv.astype(dqkv_ref.dtype)
        # dP[w] = dO[w] V[w]^T
        dp = jax.lax.dot_general(do, v, _BATCH_QK, preferred_element_type=jnp.float32)
        t = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - t)  # (wblk, ws, ws) f32

        if has_bias:
            dbias_ref[head] += jnp.sum(ds, axis=0)

        ds_lo = ds.astype(qkv.dtype)
        if use_cos:
            dls_ref[head, 0] += jnp.sum(ds * s_hat)
            dsh_lo = (ds * scale).astype(qkv.dtype)
            dqh = jax.lax.dot_general(
                dsh_lo, kh, _BATCH_AV, preferred_element_type=jnp.float32
            )
            dkh = jax.lax.dot_general(
                dsh_lo, qh, _BATCH_TN, preferred_element_type=jnp.float32
            )
            qhf = qf * inv_nq
            khf = kf * inv_nk
            dq = (dqh - qhf * jnp.sum(dqh * qhf, -1, keepdims=True)) * inv_nq
            dk = (dkh - khf * jnp.sum(dkh * khf, -1, keepdims=True)) * inv_nk
        else:
            dq = jax.lax.dot_general(
                ds_lo, k, _BATCH_AV, preferred_element_type=jnp.float32
            ) * sm_scale
            dk = jax.lax.dot_general(
                ds_lo, q, _BATCH_TN, preferred_element_type=jnp.float32
            ) * sm_scale
        dqkv_ref[:, :, head * hd:(head + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, C + head * hd:C + (head + 1) * hd] = dk.astype(dqkv_ref.dtype)


def _bwd_kernel(gcol_ref, grow_ref, qkv_ref, bias_ref, scale_ref, dout_ref,
                dqkv_ref, dbias_ref, dls_ref, *scratches, ws, C, h, wblk, use_cos,
                has_bias, has_mask, sm_scale):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    if use_cos:
        aq_ref, bk_ref = scratches
        _attn_bwd_body_cos_wide(qkv_ref[...], mask, bias_ref, scale_ref, dout_ref,
                                dqkv_ref, dbias_ref, dls_ref, aq_ref, bk_ref,
                                C=C, h=h, has_bias=has_bias)
    else:
        _attn_bwd_body(qkv_ref[...], mask, bias_ref, scale_ref, dout_ref, dqkv_ref,
                       dbias_ref, dls_ref, C=C, h=h, use_cos=False,
                       has_bias=has_bias, sm_scale=sm_scale)


def _fwd_kernel_xw(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
                   out_ref, *, ws, C, h, wblk, use_cos, has_bias, has_mask, sm_scale,
                   has_qkv_bias):
    """Fused-qkv forward: the qkv projection runs IN the kernel (x block (wblk, ws, C)
    x (C, 3C) weight), cutting the kernel's HBM stream 3x and eliminating the separate
    XLA qkv dense + its layout copy.  The attention math is _fwd_kernel's."""
    qkv = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x_ref.dtype)

    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    _attn_fwd_body(qkv, mask, bias_ref, scale_ref, out_ref, C=C, h=h,
                   use_cos=use_cos, has_bias=has_bias, sm_scale=sm_scale)


def _bwd_kernel_xw(gcol_ref, grow_ref, x_ref, w_ref, b_ref, bias_ref, scale_ref,
                   dout_ref, dx_ref, dw_ref, db_ref, dbias_ref, dls_ref, dqkv_ref,
                   *scratches, ws, C, h, wblk, use_cos, has_bias, has_mask, sm_scale,
                   has_qkv_bias):
    """Fused-qkv backward: recomputes qkv from x in VMEM, runs the attention backward
    body into a VMEM scratch dqkv, then dx = dqkv W^T and grid-accumulated
    dW = x^T dqkv / db = sum(dqkv)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    x = x_ref[...]
    w = w_ref[...]
    qkv = jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x.dtype)

    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    if use_cos:
        aq_ref, bk_ref = scratches
        _attn_bwd_body_cos_wide(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref,
                                dbias_ref, dls_ref, aq_ref, bk_ref, C=C, h=h,
                                has_bias=has_bias)
    else:
        _attn_bwd_body(qkv, mask, bias_ref, scale_ref, dout_ref, dqkv_ref, dbias_ref,
                       dls_ref, C=C, h=h, use_cos=False, has_bias=has_bias,
                       sm_scale=sm_scale)

    # dx / dW on the block flattened to (wblk*ws, ·): dW is ONE K=wblk*ws MXU dot
    # instead of a wblk-loop of K=ws dots (measured: benchmarks/attn_dw_ablate.py)
    dqkv = dqkv_ref[...].reshape(wblk * ws, 3 * C)
    dx = jax.lax.dot_general(
        dqkv, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = dx.reshape(wblk, ws, C).astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        x.reshape(wblk * ws, C), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_qkv_bias:
        db_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0).reshape(1, 3 * C)


@functools.lru_cache(maxsize=None)
def _make_fused_qkv(ws: int, C: int, h: int, use_cos: bool, has_bias: bool,
                    has_mask: bool, sm_scale: float, wblk: int, dtype_name: str,
                    has_qkv_bias: bool, interpret: bool, fwd_wblk: int | None = None,
                    bwd_wblk: int | None = None):
    dtype = jnp.dtype(dtype_name)
    fwd_wblk = fwd_wblk or wblk
    bwd_wblk = bwd_wblk or wblk

    def specs(wblk, extra_in, extra_out):
        in_specs = [
            pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_in
        return in_specs, extra_out

    def prep(x, groups, logit_scale):
        T = x.shape[0]
        nw = T // ws
        g = groups.astype(jnp.int32)
        return (nw, g.reshape(nw, ws, 1), g.reshape(nw, 1, ws),
                x.reshape(nw, ws, C), logit_scale.reshape(h, 1).astype(jnp.float32))

    def pallas_fwd(x, wqkv, bqkv, groups, bias, logit_scale):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        kernel = functools.partial(
            _fwd_kernel_xw, ws=ws, C=C, h=h, wblk=fwd_wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias,
        )
        in_specs, _ = specs(fwd_wblk, [], [])
        out = pl.pallas_call(
            kernel,
            grid=(nw // fwd_wblk,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((fwd_wblk, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=with_vma(jax.ShapeDtypeStruct((nw, ws, C), dtype), x),
            interpret=interpret,
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), bias, scale_arr)
        return out.reshape(x.shape[0], C)

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, groups, bias, logit_scale):
        return pallas_fwd(x, wqkv, bqkv, groups, bias, logit_scale)

    def fwd(x, wqkv, bqkv, groups, bias, logit_scale):
        return fused(x, wqkv, bqkv, groups, bias, logit_scale), (
            x, wqkv, bqkv, groups, bias, logit_scale,
        )

    def pallas_bwd(x, wqkv, bqkv, groups, bias, logit_scale, dout):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        bw = bwd_wblk
        kernel = functools.partial(
            _bwd_kernel_xw, ws=ws, C=C, h=h, wblk=bw, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias,
        )
        in_specs, _ = specs(
            bw,
            [pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            [],
        )
        scratch_shapes = [pltpu.VMEM((bw, ws, 3 * C), dtype)]
        if use_cos:
            scratch_shapes += [pltpu.VMEM((bw, ws, C), jnp.float32) for _ in range(2)]
        dx, dw, db, dbias, dls = pl.pallas_call(
            kernel,
            grid=(nw // bw,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((nw, ws, C), dtype),
                jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ], x),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(gcol, grow, x3, wqkv, bqkv.reshape(1, 3 * C), bias, scale_arr,
          dout.reshape(nw, ws, C))
        return dx.reshape(x.shape), dw, db, dbias, dls

    def bwd(res, g):
        x, wqkv, bqkv, groups, bias, logit_scale = res
        dx, dw, db, dbias, dls = pallas_bwd(
            x, wqkv, bqkv, groups, bias, logit_scale, g.astype(dtype)
        )
        # parameter cotangents must be typed like the (replicated) primals under
        # shard_map sequence/data sharding — see parallel/sequence.py match_vma
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dw.astype(wqkv.dtype), wqkv),
                match_vma(db.reshape(bqkv.shape).astype(bqkv.dtype), bqkv),
                _float0_like(groups), match_vma(dbias, bias),
                match_vma(dls.reshape(h), logit_scale))

    fused.defvjp(fwd, bwd)
    return fused


def fused_window_attention_qkv(x, wqkv, bqkv, groups, bias, logit_scale, *, ws,
                               num_heads, use_cos, sm_scale, has_mask=True,
                               wblk: int = 8, interpret: bool = False,
                               fwd_wblk: int | None = None,
                               bwd_wblk: int | None = None):
    """Fused qkv-projection + window attention.  x: (T, C) tokens; wqkv: (C, 3C);
    bqkv: (3C,) or None; other operands as fused_window_attention.  Returns the
    pre-output-projection attention result (T, C).

    ``fwd_wblk`` / ``bwd_wblk`` let the forward and backward use different window
    blocks than ``wblk``: the backward holds the dqkv scratch + dW accumulators
    (+ two f32 tangent scratches for cosine attention) and OOMs first."""
    if use_cos and logit_scale is None:
        raise ValueError("use_cos=True requires a logit_scale (the cosine backward "
                         "divides by it; zeros would produce NaN gradients)")
    C = x.shape[-1]
    has_qkv_bias = bqkv is not None
    fn = _make_fused_qkv(
        ws, C, num_heads, use_cos, bias is not None, has_mask, float(sm_scale), wblk,
        str(x.dtype), has_qkv_bias, interpret, fwd_wblk, bwd_wblk,
    )
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), x.dtype)
    if bias is None:
        bias = jnp.zeros((num_heads, ws, ws), jnp.float32)
    if logit_scale is None:
        logit_scale = jnp.zeros((num_heads,), jnp.float32)
    return fn(x, wqkv.astype(x.dtype), bqkv.astype(x.dtype), groups, bias, logit_scale)


@functools.lru_cache(maxsize=None)
def _make_fused(ws: int, C: int, h: int, use_cos: bool, has_bias: bool, has_mask: bool,
                sm_scale: float, wblk: int, dtype_name: str, interpret: bool,
                bwd_wblk: int | None = None):
    dtype = jnp.dtype(dtype_name)
    bwd_wblk = bwd_wblk or wblk

    def pallas_fwd(qkv, groups, bias, logit_scale):
        T = qkv.shape[0]
        nw = T // ws
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        grid = (nw // wblk,)
        kernel = functools.partial(
            _fwd_kernel, ws=ws, C=C, h=h, wblk=wblk, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
        )
        scale_arr = logit_scale.reshape(h, 1).astype(jnp.float32)
        g = groups.astype(jnp.int32)
        gcol = g.reshape(nw, ws, 1)
        grow = g.reshape(nw, 1, ws)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((wblk, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((wblk, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((wblk, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=with_vma(jax.ShapeDtypeStruct((nw, ws, C), dtype), qkv),
            interpret=interpret,
        )(gcol, grow, qkv.reshape(nw, ws, 3 * C), bias, scale_arr)
        return out.reshape(T, C)

    @jax.custom_vjp
    def fused(qkv, groups, bias, logit_scale):
        return pallas_fwd(qkv, groups, bias, logit_scale)

    def fwd(qkv, groups, bias, logit_scale):
        return fused(qkv, groups, bias, logit_scale), (qkv, groups, bias, logit_scale)

    def pallas_bwd(qkv, groups, bias, logit_scale, dout):
        T = qkv.shape[0]
        nw = T // ws
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        bw = bwd_wblk
        grid = (nw // bw,)
        kernel = functools.partial(
            _bwd_kernel, ws=ws, C=C, h=h, wblk=bw, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
        )
        scale_arr = logit_scale.reshape(h, 1).astype(jnp.float32)
        g = groups.astype(jnp.int32)
        gcol = g.reshape(nw, ws, 1)
        grow = g.reshape(nw, 1, ws)
        scratch_shapes = (
            [pltpu.VMEM((bw, ws, C), jnp.float32) for _ in range(2)] if use_cos else []
        )
        dqkv, dbias, dls = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bw, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bw, ws, 3 * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((nw, ws, 3 * C), dtype),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ], qkv),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(gcol, grow, qkv.reshape(nw, ws, 3 * C), bias, scale_arr,
          dout.reshape(nw, ws, C))
        return dqkv.reshape(T, 3 * C), dbias, dls

    def bwd(res, g):
        qkv, groups, bias, logit_scale = res
        dqkv, dbias, dls = pallas_bwd(qkv, groups, bias, logit_scale, g.astype(dtype))
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dqkv, _float0_like(groups), match_vma(dbias, bias),
                match_vma(dls.reshape(h), logit_scale))

    fused.defvjp(fwd, bwd)
    return fused


def supported(backend: str, T: int, ws: int, num_heads: int, C: int,
              wblk: int = 8) -> bool:
    """Whether the fused kernel handles this shape on this backend."""
    if backend != "tpu":
        return False
    if C % num_heads != 0:
        return False
    nw = T // ws
    return T % ws == 0 and nw % wblk == 0 and ws % 8 == 0


def fused_window_attention(qkv, groups, bias, logit_scale, *, ws, num_heads, use_cos,
                           sm_scale, has_mask=True, wblk: int = 8,
                           interpret: bool = False, bwd_wblk: int | None = None):
    """Entry point.  qkv: (T, 3C); groups: (T//ws, ws) int32; bias: (h, ws, ws) f32 or
    None; logit_scale: (h,) f32 (pre-exp'd) or None.  Returns (T, C)."""
    if use_cos and logit_scale is None:
        raise ValueError("use_cos=True requires a logit_scale (the cosine backward "
                         "divides by it; zeros would produce NaN gradients)")
    C = qkv.shape[-1] // 3
    fn = _make_fused(
        ws, C, num_heads, use_cos, bias is not None, has_mask, float(sm_scale), wblk,
        str(qkv.dtype), interpret, bwd_wblk,
    )
    if bias is None:
        bias = jnp.zeros((num_heads, ws, ws), jnp.float32)
    if logit_scale is None:
        logit_scale = jnp.zeros((num_heads,), jnp.float32)
    return fn(qkv, groups, bias, logit_scale)


# ---------------------------------------------------------------------------------
# Epilogue-fused variant: qkv projection + window attention + OUTPUT projection
# (+ optional LayerNorm, for the SWIN-v2 res-post-norm placement).
#
# The v2 block computes  shortcut + DropPath(LN(attn(shift(x)) @ Wp))  with the LN
# applied after the inverse shift — but LN is per-token, so it commutes with the
# permutation and can run INSIDE the kernel.  Fusing proj+LN removes ~5 XLA passes
# over the (T, C) activation per block (proj fwd, LN fwd, LN bwd, proj bwd dX/dW)
# plus their layout copies; the backward recomputes attention, caches the per-head
# softmax in a VMEM scratch, and chains LN^T -> proj^T -> attention^T without
# touching HBM.  Cosine attention only (the flagship config).
# ---------------------------------------------------------------------------------


def _proj_ln_fwd(o_lo, wp_ref, bp_ref, g_ref, be_ref, *, has_ln, ln_eps):
    """u = o @ Wp + bp with f32 accumulation; optional LayerNorm with f32 stats.
    Returns z (f32, (wblk, ws, C))."""
    f32 = jnp.float32
    u = jax.lax.dot_general(o_lo, wp_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
    u = u + bp_ref[...][None].astype(f32)
    if not has_ln:
        return u
    mean = jnp.mean(u, axis=-1, keepdims=True)
    xc = u - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    return xc * rstd * g_ref[...][None] + be_ref[...][None]


def _fwd_kernel_xw_epi(gcol_ref, grow_ref, x_ref, w_ref, b_ref, wp_ref, bp_ref,
                       g_ref, be_ref, bias_ref, scale_ref, out_ref, o_scr, *, ws, C,
                       h, wblk, use_cos, has_bias, has_mask, sm_scale, has_qkv_bias,
                       has_ln, ln_eps):
    qkv = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x_ref.dtype)
    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    _attn_fwd_body(qkv, mask, bias_ref, scale_ref, o_scr, C=C, h=h, use_cos=use_cos,
                   has_bias=has_bias, sm_scale=sm_scale)
    z = _proj_ln_fwd(o_scr[...], wp_ref, bp_ref, g_ref, be_ref, has_ln=has_ln,
                     ln_eps=ln_eps)
    out_ref[...] = z.astype(out_ref.dtype)


def _bwd_kernel_xw_epi(gcol_ref, grow_ref, x_ref, w_ref, b_ref, wp_ref, bp_ref,
                       g_ref, be_ref, bias_ref, scale_ref, dz_ref,
                       dx_ref, dw_ref, db_ref, dwp_ref, dbp_ref, dg_ref, dbe_ref,
                       dbias_ref, dls_ref,
                       dqkv_scr, o_scr, p_scr, aq_scr, bk_scr, *, ws, C, h, wblk,
                       use_cos, has_bias, has_mask, sm_scale, has_qkv_bias, has_ln,
                       ln_eps):
    """Two-phase backward: phase 1 recomputes the per-head softmax (cached into
    p_scr, layout (h*wblk, ws, ws) f32) and the attention output o; the LN/proj
    chain then produces do in VMEM; phase 2 consumes the cached p for the
    attention gradients."""
    f32 = jnp.float32
    hd = C // h

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        for _hh in range(h):
            dls_ref[_hh, 0] = 0.0

    x = x_ref[...]
    w = w_ref[...]
    qkv = jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )
    if has_qkv_bias:
        qkv = qkv + b_ref[...][None]
    qkv = qkv.astype(x.dtype)
    mask = _mask_from_groups(gcol_ref, grow_ref, has_mask)
    pre = _cos_wide_preamble(qkv, C, h, scale_ref[...][:, 0])

    # phase 1: softmax (cached) + attention output o
    for head in range(h):
        sl = slice(head * hd, (head + 1) * hd)
        _, p = _cos_wide_softmax(qkv, mask, bias_ref, scale_ref, pre, head,
                                 C=C, h=h, has_bias=has_bias)
        p_scr[head * wblk:(head + 1) * wblk] = p
        v = qkv[:, :, 2 * C + head * hd:2 * C + (head + 1) * hd]
        o_scr[:, :, sl] = jax.lax.dot_general(
            p.astype(v.dtype), v, _BATCH_AV, preferred_element_type=f32
        ).astype(o_scr.dtype)

    # LN / proj chain in VMEM
    o = o_scr[...]
    u = jax.lax.dot_general(o, wp_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=f32)
    u = u + bp_ref[...][None].astype(f32)
    dzf = dz_ref[...].astype(f32)
    if has_ln:
        mean = jnp.mean(u, axis=-1, keepdims=True)
        xc = u - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + ln_eps)
        xhat = xc * rstd
        dg_ref[...] += jnp.sum(dzf * xhat, axis=(0, 1)).reshape(1, C)
        dbe_ref[...] += jnp.sum(dzf, axis=(0, 1)).reshape(1, C)
        dgl = dzf * g_ref[...][None]
        du = rstd * (
            dgl
            - jnp.mean(dgl, axis=-1, keepdims=True)
            - xhat * jnp.mean(dgl * xhat, axis=-1, keepdims=True)
        )
    else:
        du = dzf
    du_lo = du.astype(x.dtype)
    rows = wblk * ws
    dwp_ref[...] += jax.lax.dot_general(
        o.reshape(rows, C), du_lo.reshape(rows, C), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dbp_ref[...] += jnp.sum(du, axis=(0, 1)).reshape(1, C)
    do_full = jax.lax.dot_general(du_lo, wp_ref[...], (((2,), (1,)), ((), ())),
                                  preferred_element_type=f32).astype(x.dtype)

    # phase 2: attention gradients from the cached softmax
    for head in range(h):
        sl = slice(head * hd, (head + 1) * hd)
        p = p_scr[head * wblk:(head + 1) * wblk]
        _cos_wide_head_bwd(qkv, mask, bias_ref, scale_ref, do_full[:, :, sl],
                           dqkv_scr, dbias_ref, aq_scr, bk_scr, pre, head,
                           C=C, h=h, has_bias=has_bias, p=p)
    _cos_wide_tangent(aq_scr, bk_scr, pre, dqkv_scr, dls_ref, C=C, h=h)

    dqkv = dqkv_scr[...].reshape(rows, 3 * C)
    dx = jax.lax.dot_general(
        dqkv, w, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dx_ref[...] = dx.reshape(wblk, ws, C).astype(dx_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        x.reshape(rows, C), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    if has_qkv_bias:
        db_ref[...] += jnp.sum(dqkv.astype(f32), axis=0).reshape(1, 3 * C)


@functools.lru_cache(maxsize=None)
def _make_fused_qkv_epi(ws: int, C: int, h: int, has_bias: bool, has_mask: bool,
                        sm_scale: float, wblk: int, dtype_name: str,
                        has_qkv_bias: bool, has_proj_bias: bool, has_ln: bool,
                        ln_eps: float, interpret: bool, fwd_wblk: int | None,
                        bwd_wblk: int | None):
    dtype = jnp.dtype(dtype_name)
    fwd_wblk = fwd_wblk or wblk
    bwd_wblk = bwd_wblk or wblk
    use_cos = True  # epilogue fusion is implemented for cosine attention only

    def const_specs():
        return [
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    def block_specs(wb):
        return [
            pl.BlockSpec((wb, ws, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, 1, ws), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, ws, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]

    def prep(x, groups, logit_scale):
        T = x.shape[0]
        nw = T // ws
        g = groups.astype(jnp.int32)
        return (nw, g.reshape(nw, ws, 1), g.reshape(nw, 1, ws),
                x.reshape(nw, ws, C), logit_scale.reshape(h, 1).astype(jnp.float32))

    def operands(wqkv, bqkv, wp, bp, gamma, beta):
        return (wqkv, bqkv.reshape(1, 3 * C), wp, bp.reshape(1, C),
                gamma.reshape(1, C).astype(jnp.float32),
                beta.reshape(1, C).astype(jnp.float32))

    def pallas_fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        fw = fwd_wblk
        kernel = functools.partial(
            _fwd_kernel_xw_epi, ws=ws, C=C, h=h, wblk=fw, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias, has_ln=has_ln, ln_eps=ln_eps,
        )
        out = pl.pallas_call(
            kernel,
            grid=(nw // fw,),
            in_specs=block_specs(fw) + const_specs(),
            out_specs=pl.BlockSpec((fw, ws, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=with_vma(jax.ShapeDtypeStruct((nw, ws, C), dtype), x),
            scratch_shapes=[pltpu.VMEM((fw, ws, C), dtype)],
            interpret=interpret,
        )(gcol, grow, x3, *operands(wqkv, bqkv, wp, bp, gamma, beta), bias,
          scale_arr)
        return out.reshape(x.shape[0], C)

    @jax.custom_vjp
    def fused(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        return pallas_fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias,
                          logit_scale)

    def fwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale):
        return fused(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias,
                     logit_scale), (
            x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale,
        )

    def pallas_bwd(x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale,
                   dz):
        nw, gcol, grow, x3, scale_arr = prep(x, groups, logit_scale)
        bias = _shift_bias(bias, logit_scale, use_cos, has_bias)
        bw = bwd_wblk
        kernel = functools.partial(
            _bwd_kernel_xw_epi, ws=ws, C=C, h=h, wblk=bw, use_cos=use_cos,
            has_bias=has_bias, has_mask=has_mask, sm_scale=sm_scale,
            has_qkv_bias=has_qkv_bias, has_ln=has_ln, ln_eps=ln_eps,
        )
        outs = pl.pallas_call(
            kernel,
            grid=(nw // bw,),
            in_specs=block_specs(bw) + const_specs() + [
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bw, ws, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((h, ws, ws), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((nw, ws, C), dtype),
                jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                jax.ShapeDtypeStruct((C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((h, ws, ws), jnp.float32),
                jax.ShapeDtypeStruct((h, 1), jnp.float32),
            ], x),
            scratch_shapes=[
                pltpu.VMEM((bw, ws, 3 * C), dtype),
                pltpu.VMEM((bw, ws, C), dtype),
                pltpu.VMEM((h * bw, ws, ws), jnp.float32),
                pltpu.VMEM((bw, ws, C), jnp.float32),
                pltpu.VMEM((bw, ws, C), jnp.float32),
            ],
            interpret=interpret,
        )(gcol, grow, x3, *operands(wqkv, bqkv, wp, bp, gamma, beta), bias,
          scale_arr, dz.reshape(nw, ws, C))
        dx, dw, db, dwp, dbp, dg, dbe, dbias, dls = outs
        return dx.reshape(x.shape), dw, db, dwp, dbp, dg, dbe, dbias, dls

    def bwd(res, g):
        x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale = res
        dx, dw, db, dwp, dbp, dg, dbe, dbias, dls = pallas_bwd(
            x, wqkv, bqkv, wp, bp, gamma, beta, groups, bias, logit_scale,
            g.astype(dtype))
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dw.astype(wqkv.dtype), wqkv),
                match_vma(db.reshape(bqkv.shape).astype(bqkv.dtype), bqkv),
                match_vma(dwp.astype(wp.dtype), wp),
                match_vma(dbp.reshape(bp.shape).astype(bp.dtype), bp),
                match_vma(dg.reshape(gamma.shape), gamma),
                match_vma(dbe.reshape(beta.shape), beta),
                _float0_like(groups), match_vma(dbias, bias),
                match_vma(dls.reshape(h), logit_scale))

    fused.defvjp(fwd, bwd)
    return fused


def fused_window_attention_qkv_epi(x, wqkv, bqkv, wp, bp, ln_scale, ln_bias, groups,
                                   bias, logit_scale, *, ws, num_heads, sm_scale,
                                   has_mask=True, wblk: int = 8,
                                   interpret: bool = False,
                                   fwd_wblk: int | None = None,
                                   bwd_wblk: int | None = None,
                                   ln_eps: float = 1e-5):
    """Fused qkv-projection + cosine window attention + output projection
    (+ LayerNorm when ln_scale is given — the SWIN-v2 res-post-norm).  x: (T, C);
    wqkv: (C, 3C); wp: (C, C); returns z = [LN](attn(x) @ wp + bp) as (T, C).
    Gradients flow to every parameter operand (dbias/dlogit_scale/dln grid-
    accumulated in the backward kernel)."""
    if logit_scale is None:  # this variant is cosine-only
        raise ValueError("fused_window_attention_qkv_epi requires a logit_scale (the "
                         "cosine backward divides by it; zeros would produce NaN "
                         "gradients)")
    C = x.shape[-1]
    has_qkv_bias = bqkv is not None
    has_proj_bias = bp is not None
    has_ln = ln_scale is not None
    fn = _make_fused_qkv_epi(
        ws, C, num_heads, bias is not None, has_mask, float(sm_scale), wblk,
        str(x.dtype), has_qkv_bias, has_proj_bias, has_ln, float(ln_eps), interpret,
        fwd_wblk, bwd_wblk,
    )
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), x.dtype)
    if bp is None:
        bp = jnp.zeros((C,), x.dtype)
    if ln_scale is None:
        ln_scale = jnp.ones((C,), jnp.float32)
        ln_bias = jnp.zeros((C,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((num_heads, ws, ws), jnp.float32)
    return fn(x, wqkv.astype(x.dtype), bqkv.astype(x.dtype), wp.astype(x.dtype),
              bp.astype(x.dtype), ln_scale, ln_bias, groups, bias, logit_scale)
