"""Fused decoder tail: FinalPatchExpand dense -> LayerNorm -> head dense ->
weighted cross entropy, as ONE Pallas TPU kernel (forward + custom-VJP backward).

The region is the tail of the UNet decoder (models/swin_hp.py:399-401, reference
swin_hp_transformer.py:433-452 FinalPatchExpand_X4 + the segmentation loss
model_lightning_swin_hp.py:45) — at paper scale XLA materializes the expanded
(B, N*p, C) activation twice (dense output + the reshape/LN copy) plus f32 logits
and dlogits, >600 MB of HBM traffic per step.  The kernel keeps everything after
the (T, C) token input in VMEM:

    x (T, C) --p dots--> h_i = x @ We_i (T, C), i < p
      -> LN_i -> z_i -> logits_i = z_i @ Wh (T, F)
      -> log-softmax -> nll/weights -> (sum w*nll, sum w) scalars (+ argmax preds)

The p "sub-rows" of the reshape (T, p*C) -> (T*p, C) are exactly the p column
slices of the expand output, i.e. p independent (C, C) sub-matmuls — the expand
kernel is passed pre-split as (p, C, C) so every in-kernel slice is a free
leading-dim index (lane slicing at C=96 offsets would be Mosaic-misaligned).
Targets/per-element weights arrive pre-shaped (T, p).  The backward recomputes the
forward per block (flash-style; ~21 GFLOP/step extra at paper scale, ~0.2 ms, far
below the saved traffic) and emits dx per block plus grid-accumulated
dWe/dWh/dgamma/dbeta (constant-index f32 output blocks; the TPU grid is sequential
so accumulation is race-free).

Loss semantics match training/losses.py weighted_cross_entropy: torch
CrossEntropyLoss(weight=w) = sum_i w[y_i] nll_i / sum_i w[y_i], with the per-element
weight (class weight x optional sample mask) precomputed host-side into ``welem``.
Intermediate roundings (bf16 h, bf16 z, bf16 logits) match the XLA path so the
fused loss is f32-close to the unfused one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _ln_rows(hf, gamma, beta):
    """f32 LN over the last axis; returns (y, xhat, rstd)."""
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    xc = hf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * gamma + beta, xhat, rstd


def reference_final_head(x, we, gamma, beta, wh, y, welem, *, patch_size):
    """Pure-jnp oracle on the kernel layout.  x: (T, C); we: (C, p*C) flax layout;
    wh: (C, F); y/welem: (T, p).  Returns (loss, confmat (F, F) f32) with
    confmat[t, q] = #pixels with target t and argmax-pred q."""
    p, C = patch_size, x.shape[-1]
    F = wh.shape[-1]
    h = jnp.dot(x, we.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    cm = jnp.zeros((F, F), jnp.float32)
    for i in range(p):
        hf = h[:, i * C:(i + 1) * C].astype(jnp.float32)
        z, _, _ = _ln_rows(hf, gamma.astype(jnp.float32), beta.astype(jnp.float32))
        z = z.astype(x.dtype)
        logits = jnp.dot(z, wh.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        lf = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(lf, axis=-1)
        onehot = jax.nn.one_hot(y[:, i], F, dtype=jnp.float32)
        nll = -jnp.sum(logp * onehot, axis=-1)
        w = welem[:, i].astype(jnp.float32)
        num = num + jnp.sum(w * nll)
        den = den + jnp.sum(w)
        pred_oh = jax.nn.one_hot(jnp.argmax(lf, axis=-1), F, dtype=jnp.float32)
        cm = cm + onehot.T @ pred_oh
    return num / jnp.maximum(den, 1e-12), cm


def _slice_ce(lf, yi, wi):
    """Shared CE math on one slice's f32 logits.  lf: (rblk, F); yi/wi: (rblk, 1).
    Returns (softmax, onehot, nll (rblk,1), pred_onehot (rblk,F))."""
    F = lf.shape[-1]
    mx = jnp.max(lf, axis=-1, keepdims=True)
    e = jnp.exp(lf - mx)
    se = jnp.sum(e, axis=-1, keepdims=True)
    lse = jnp.log(se)
    lane = jax.lax.broadcasted_iota(jnp.int32, lf.shape, 1)
    onehot = (lane == yi).astype(jnp.float32)
    ly = jnp.sum(lf * onehot, axis=-1, keepdims=True)
    nll = mx + lse - ly
    # first-max index (argmax tie-break = lowest index), kept as (rblk, 1).
    # f32 lanes: small ints are exact in f32 and the f32 lane min-reduce is much
    # cheaper than i32 on the VPU (measured in benchmarks/final_head_probe.py).
    lane_f = lane.astype(jnp.float32)  # Mosaic iota is int-only; convert
    pred_idx = jnp.min(
        jnp.where(lf >= mx, lane_f, jnp.float32(F)), axis=-1, keepdims=True
    )
    return e / se, onehot, nll, pred_idx


def _fwd_kernel(x_ref, we_ref, g_ref, b_ref, wh_ref, y_ref, w_ref,
                num_ref, den_ref, cm_ref, *, p, C, F):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        num_ref[...] = jnp.zeros_like(num_ref)
        den_ref[...] = jnp.zeros_like(den_ref)
        cm_ref[...] = jnp.zeros_like(cm_ref)

    x = x_ref[...]
    gamma = g_ref[...]  # (1, C) f32
    beta = b_ref[...]
    wh = wh_ref[...]
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    cm = jnp.zeros((1, F * F), jnp.float32)
    for i in range(p):
        h = jax.lax.dot_general(
            x, we_ref[i], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        z, _, _ = _ln_rows(h.astype(jnp.float32), gamma, beta)
        z = z.astype(x.dtype)
        logits = jax.lax.dot_general(
            z, wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        yi = y_ref[:, i:i + 1]
        wi = w_ref[:, i:i + 1]
        _, onehot, nll, pred_idx = _slice_ce(logits.astype(jnp.float32), yi, wi)
        num += jnp.sum(wi * nll)
        den += jnp.sum(wi)
        # confusion-matrix contribution via a combined-index one-hot + sublane
        # reduce — a dim-0 (F, F) contraction would force a transpose relayout of
        # the narrow operands (~5 ms/step measured); this is 3 cheap VPU passes.
        # All-NaN logit rows give pred_idx == F (NaN comparisons are false); route
        # them to -1 (matches no lane) instead of aliasing into (y+1, class 0)
        comb = yi.astype(jnp.float32) * F + pred_idx  # (rblk, 1) in [0, F*F), exact f32
        comb = jnp.where(pred_idx >= F, jnp.float32(-1.0), comb)
        lane2 = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], F * F), 1
        ).astype(jnp.float32)
        cm += jnp.sum((lane2 == comb).astype(jnp.float32), axis=0, keepdims=True)
    num_ref[...] = num_ref[...] + num
    den_ref[...] = den_ref[...] + den
    cm_ref[...] = cm_ref[...] + cm


def _pred_kernel(x_ref, we_ref, g_ref, b_ref, wh_ref, preds_ref, *, p, C, F):
    """Inference tail: argmax class indices straight out of the kernel (no logits
    materialization).  Same math as _fwd_kernel minus the CE/confmat."""
    x = x_ref[...]
    gamma = g_ref[...]
    beta = b_ref[...]
    wh = wh_ref[...]
    for i in range(p):
        h = jax.lax.dot_general(
            x, we_ref[i], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        z, _, _ = _ln_rows(h.astype(jnp.float32), gamma, beta)
        z = z.astype(x.dtype)
        lf = jax.lax.dot_general(
            z, wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        mx = jnp.max(lf, axis=-1, keepdims=True)
        lane_f = jax.lax.broadcasted_iota(jnp.int32, lf.shape, 1).astype(jnp.float32)
        pred = jnp.min(
            jnp.where(lf >= mx, lane_f, jnp.float32(F)), axis=-1, keepdims=True
        )
        # all-NaN rows give F; clamp into the class range (matches argmax-on-NaN
        # returning an arbitrary valid index rather than an out-of-range one)
        pred = jnp.minimum(pred, jnp.float32(F - 1))
        preds_ref[:, i:i + 1] = pred.astype(jnp.int32)


def fused_final_head_predict(x, we, gamma, beta, wh, *, patch_size: int,
                             rblk: int | None = None, interpret: bool = False):
    """Inference decoder tail: FinalPatchExpand -> LN -> head -> argmax as one
    kernel.  x: (T, C); returns (T, p) int32 class indices, equal to
    argmax(reference logits) with lowest-index tie-break (the fused train path's
    prediction convention, _slice_ce).  Serving path: skips the (T*p, F) f32
    logits round-trip through HBM entirely."""
    T, C = x.shape
    F = wh.shape[-1]
    p = patch_size
    if rblk is None:
        rblk = pick_rblk(T, C, p)
    if rblk is None:
        raise ValueError(f"fused_final_head_predict: no supported row block for T={T}")
    we_s = we.reshape(C, p, C).transpose(1, 0, 2).astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_pred_kernel, p=p, C=C, F=F),
        grid=(T // rblk,),
        in_specs=[
            pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, p), jnp.int32),
        interpret=interpret,
    )(x, we_s, gamma.reshape(1, C).astype(jnp.float32),
      beta.reshape(1, C).astype(jnp.float32), wh.astype(x.dtype))


def _bwd_kernel(x_ref, we_ref, g_ref, b_ref, wh_ref, y_ref, w_ref, scale_ref,
                dx_ref, dwe_ref, dwh_ref, dg_ref, db_ref, *, p, C, F):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    gamma = g_ref[...]
    beta = b_ref[...]
    wh = wh_ref[...]
    scale = scale_ref[...]  # (1, 1): gloss / den
    dx_acc = jnp.zeros((x.shape[0], C), jnp.float32)
    dwh_acc = jnp.zeros((C, F), jnp.float32)
    dg_acc = jnp.zeros((1, C), jnp.float32)
    db_acc = jnp.zeros((1, C), jnp.float32)
    for i in range(p):
        we_i = we_ref[i]
        h = jax.lax.dot_general(
            x, we_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        z, xhat, rstd = _ln_rows(h.astype(jnp.float32), gamma, beta)
        z = z.astype(x.dtype)
        logits = jax.lax.dot_general(
            z, wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        yi = y_ref[:, i:i + 1]
        wi = w_ref[:, i:i + 1]
        sm, onehot, _, _pred_idx = _slice_ce(logits.astype(jnp.float32), yi, wi)
        dlogits = (scale * wi) * (sm - onehot)  # (rblk, F) f32
        dlog_lo = dlogits.astype(x.dtype)
        dwh_acc += jax.lax.dot_general(
            z, dlog_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dz = jax.lax.dot_general(
            dlog_lo, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dg_acc += jnp.sum(dz * xhat, axis=0, keepdims=True)
        db_acc += jnp.sum(dz, axis=0, keepdims=True)
        dzh = dz * gamma
        dh = rstd * (
            dzh
            - jnp.mean(dzh, axis=-1, keepdims=True)
            - xhat * jnp.mean(dzh * xhat, axis=-1, keepdims=True)
        )
        dh_lo = dh.astype(x.dtype)
        dx_acc += jax.lax.dot_general(
            dh_lo, we_i, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwe_ref[i] += jax.lax.dot_general(
            x, dh_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dx_ref[...] = dx_acc.astype(dx_ref.dtype)
    dwh_ref[...] += dwh_acc
    dg_ref[...] += dg_acc
    db_ref[...] += db_acc


def _jnp_fwd(x, we_s, gamma, beta, wh, y, welem, *, p, C, F):
    """Pure-jnp twin of ``_fwd_kernel`` (same math, whole-T).  Used in INTERPRET
    mode inside ``shard_map(check_vma=True)``, where the pallas HLO interpreter's
    internal dynamic_slice mixes varying operands with invariant loop indices and
    fails vma typing (a jax limitation).  The custom-VJP/psum semantics around it
    are identical; kernel-vs-twin math parity is pinned by the unsharded interpret
    tests (both equal reference_final_head)."""
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    cm = jnp.zeros((1, F * F), jnp.float32)
    for i in range(p):
        h = jax.lax.dot_general(
            x, we_s[i], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        z, _, _ = _ln_rows(h.astype(jnp.float32), gamma, beta)
        z = z.astype(x.dtype)
        logits = jax.lax.dot_general(
            z, wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        yi = y[:, i:i + 1]
        wi = welem[:, i:i + 1]
        _, onehot, nll, pred_idx = _slice_ce(logits.astype(jnp.float32), yi, wi)
        num += jnp.sum(wi * nll)
        den += jnp.sum(wi)
        comb = yi.astype(jnp.float32) * F + pred_idx
        comb = jnp.where(pred_idx >= F, jnp.float32(-1.0), comb)
        lane2 = jax.lax.broadcasted_iota(
            jnp.int32, (x.shape[0], F * F), 1
        ).astype(jnp.float32)
        cm += jnp.sum((lane2 == comb).astype(jnp.float32), axis=0, keepdims=True)
    return num.reshape(1, 1), den.reshape(1, 1), cm


def _jnp_bwd(x, we_s, gamma, beta, wh, y, welem, scale, *, p, C, F):
    """Pure-jnp twin of ``_bwd_kernel`` (see _jnp_fwd)."""
    dx_acc = jnp.zeros((x.shape[0], C), jnp.float32)
    dwh_acc = jnp.zeros((C, F), jnp.float32)
    dg_acc = jnp.zeros((1, C), jnp.float32)
    db_acc = jnp.zeros((1, C), jnp.float32)
    dwe = []
    for i in range(p):
        we_i = we_s[i]
        h = jax.lax.dot_general(
            x, we_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        z, xhat, rstd = _ln_rows(h.astype(jnp.float32), gamma, beta)
        z = z.astype(x.dtype)
        logits = jax.lax.dot_general(
            z, wh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        yi = y[:, i:i + 1]
        wi = welem[:, i:i + 1]
        sm, onehot, _, _ = _slice_ce(logits.astype(jnp.float32), yi, wi)
        dlogits = (scale * wi) * (sm - onehot)
        dlog_lo = dlogits.astype(x.dtype)
        dwh_acc += jax.lax.dot_general(
            z, dlog_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dz = jax.lax.dot_general(
            dlog_lo, wh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dg_acc += jnp.sum(dz * xhat, axis=0, keepdims=True)
        db_acc += jnp.sum(dz, axis=0, keepdims=True)
        dzh = dz * gamma
        dh = rstd * (
            dzh
            - jnp.mean(dzh, axis=-1, keepdims=True)
            - xhat * jnp.mean(dzh * xhat, axis=-1, keepdims=True)
        )
        dh_lo = dh.astype(x.dtype)
        dx_acc += jax.lax.dot_general(
            dh_lo, we_i, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwe.append(jax.lax.dot_general(
            x, dh_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
    return (dx_acc.astype(x.dtype), jnp.stack(dwe), dwh_acc, dg_acc, db_acc)


# --------------------------------------------------------------------------- depth
# Depth-regression variant of the fused tail (VERDICT r2 item 2): the SAME
# expand+LN+head region (reference swin_hp_transformer.py:765-791) with f_out 1-2
# and the masked depth losses (training/losses.py mse/l1_loss/huber_loss/
# mean_log_var_loss, reference loss_depth_regression.py:9-83) computed in-kernel.
# The head is f_out<=2 wide, so instead of an MXU dot it is a lane-wise
# multiply + reduce per channel; the kernel emits the (T, p) per-channel
# predictions (tiny — npix floats) so the trainer's metric_update runs unchanged.


def _depth_loss_vals(lf, ti, valid, *, kind, delta):
    """Per-element loss values on one slice.  lf: list of F (rblk, 1) f32 logits;
    ti: (rblk, 1) f32 targets (inf = masked); returns (rblk, 1) f32 vals (garbage at
    invalid rows — caller masks).  Mirrors training/losses.py semantics."""
    d = lf[0] - jnp.where(valid, ti, 0.0)  # _masked_diff: no inf in the arithmetic
    d = jnp.where(valid, d, 0.0)
    if kind == "l2":
        return 0.5 * d * d
    if kind == "l1":
        return jnp.abs(d)
    if kind == "huber":
        ad = jnp.abs(d)
        return jnp.where(ad < delta, 0.5 * ad * ad / delta, ad - 0.5 * delta)
    if kind == "nll":
        lv = jnp.where(valid, lf[1], 0.0)
        return 0.5 * lv + (0.5 * d * d) * jnp.exp(-lv)
    raise ValueError(kind)


def _depth_loss_grads(lf, ti, valid, *, kind, delta):
    """d vals / d logits on one slice; list of F (rblk, 1) f32 (0 at invalid)."""
    d = lf[0] - jnp.where(valid, ti, 0.0)
    d = jnp.where(valid, d, 0.0)
    F = len(lf)
    if kind == "l2":
        g0 = d
    elif kind == "l1":
        g0 = jnp.sign(d)
    elif kind == "huber":
        g0 = jnp.where(jnp.abs(d) < delta, d / delta, jnp.sign(d))
    elif kind == "nll":
        lv = jnp.where(valid, lf[1], 0.0)
        e = jnp.exp(-lv)
        g0 = d * e
        g1 = jnp.where(valid, 0.5 - (0.5 * d * d) * e, 0.0)
        return [jnp.where(valid, g0, 0.0), g1]
    else:
        raise ValueError(kind)
    out = [jnp.where(valid, g0, 0.0)]
    if F > 1:  # logvar channel present but loss not yet switched to NLL
        out.append(jnp.zeros_like(g0))
    return out


def _depth_rows(x, we_i, gamma, beta, wh, F):
    """Shared expand+LN+head math on one slice.  Returns (z_f32 of the bf16-rounded
    LN output, xhat, rstd, logits list of (rblk, 1) f32).  wh: (F, C) in x.dtype —
    products upcast to f32 so the lane-reduce matches the XLA bf16-dot-f32-accum."""
    h = jax.lax.dot_general(
        x, we_i, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    z, xhat, rstd = _ln_rows(h.astype(jnp.float32), gamma, beta)
    z = z.astype(x.dtype).astype(jnp.float32)
    logits = [
        jnp.sum(z * wh[f:f + 1, :].astype(jnp.float32), axis=-1, keepdims=True)
        for f in range(F)
    ]
    return z, xhat, rstd, logits


def _fwd_kernel_depth(x_ref, we_ref, g_ref, b_ref, wh_ref, t_ref,
                      num_ref, den_ref, preds_ref, *, p, C, F, kind, delta):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        num_ref[...] = jnp.zeros_like(num_ref)
        den_ref[...] = jnp.zeros_like(den_ref)

    x = x_ref[...]
    gamma = g_ref[...]
    beta = b_ref[...]
    wh = wh_ref[...]  # (F, C)
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    for i in range(p):
        _, _, _, lf = _depth_rows(x, we_ref[i], gamma, beta, wh, F)
        ti = t_ref[:, i:i + 1]
        valid = jnp.isfinite(ti)
        vals = _depth_loss_vals(lf, ti, valid, kind=kind, delta=delta)
        num += jnp.sum(jnp.where(valid, vals, 0.0))
        den += jnp.sum(valid.astype(jnp.float32))
        for f in range(F):
            preds_ref[:, i * F + f:i * F + f + 1] = lf[f].astype(preds_ref.dtype)
    num_ref[...] = num_ref[...] + num
    den_ref[...] = den_ref[...] + den


def _bwd_kernel_depth(x_ref, we_ref, g_ref, b_ref, wh_ref, t_ref, scale_ref,
                      dx_ref, dwe_ref, dwh_ref, dg_ref, db_ref, *, p, C, F, kind, delta):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    gamma = g_ref[...]
    beta = b_ref[...]
    wh = wh_ref[...]
    scale = scale_ref[...]  # (1, 1): gloss / den
    dx_acc = jnp.zeros((x.shape[0], C), jnp.float32)
    # per-channel row accumulators (F <= 2): a functional .at[].add on a VMEM
    # value would lower to a dynamic-update-slice Mosaic can't always tile
    dwh_rows = [jnp.zeros((1, C), jnp.float32) for _ in range(F)]
    dg_acc = jnp.zeros((1, C), jnp.float32)
    db_acc = jnp.zeros((1, C), jnp.float32)
    for i in range(p):
        we_i = we_ref[i]
        z, xhat, rstd, lf = _depth_rows(x, we_i, gamma, beta, wh, F)
        ti = t_ref[:, i:i + 1]
        valid = jnp.isfinite(ti)
        gs = _depth_loss_grads(lf, ti, valid, kind=kind, delta=delta)
        # dz = sum_f dlogit_f * wh_f; dwh_f = sum_rows dlogit_f * z
        dz = jnp.zeros((x.shape[0], C), jnp.float32)
        for f in range(F):
            dlog = scale * gs[f]  # (rblk, 1) f32
            whf = wh[f:f + 1, :].astype(jnp.float32)
            dz = dz + dlog * whf
            dwh_rows[f] = dwh_rows[f] + jnp.sum(dlog * z, axis=0, keepdims=True)
        dg_acc += jnp.sum(dz * xhat, axis=0, keepdims=True)
        db_acc += jnp.sum(dz, axis=0, keepdims=True)
        dzh = dz * gamma
        dh = rstd * (
            dzh
            - jnp.mean(dzh, axis=-1, keepdims=True)
            - xhat * jnp.mean(dzh * xhat, axis=-1, keepdims=True)
        )
        dh_lo = dh.astype(x.dtype)
        dx_acc += jax.lax.dot_general(
            dh_lo, we_i, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwe_ref[i] += jax.lax.dot_general(
            x, dh_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    dx_ref[...] = dx_acc.astype(dx_ref.dtype)
    dwh_ref[...] += jnp.concatenate(dwh_rows, axis=0)
    dg_ref[...] += dg_acc
    db_ref[...] += db_acc


def _jnp_fwd_depth(x, we_s, gamma, beta, wh, t, *, p, C, F, kind, delta):
    """Pure-jnp twin of ``_fwd_kernel_depth`` (see _jnp_fwd for why it exists)."""
    num = jnp.zeros((), jnp.float32)
    den = jnp.zeros((), jnp.float32)
    preds = []
    for i in range(p):
        _, _, _, lf = _depth_rows(x, we_s[i], gamma, beta, wh, F)
        ti = t[:, i:i + 1]
        valid = jnp.isfinite(ti)
        vals = _depth_loss_vals(lf, ti, valid, kind=kind, delta=delta)
        num += jnp.sum(jnp.where(valid, vals, 0.0))
        den += jnp.sum(valid.astype(jnp.float32))
        preds.append(jnp.concatenate([v.astype(x.dtype) for v in lf], axis=-1))
    return num.reshape(1, 1), den.reshape(1, 1), jnp.concatenate(preds, axis=-1).reshape(
        x.shape[0], p * F
    )


def _jnp_bwd_depth(x, we_s, gamma, beta, wh, t, scale, *, p, C, F, kind, delta):
    """Pure-jnp twin of ``_bwd_kernel_depth``."""
    dx_acc = jnp.zeros((x.shape[0], C), jnp.float32)
    dwh_acc = jnp.zeros((F, C), jnp.float32)
    dg_acc = jnp.zeros((1, C), jnp.float32)
    db_acc = jnp.zeros((1, C), jnp.float32)
    dwe = []
    for i in range(p):
        we_i = we_s[i]
        z, xhat, rstd, lf = _depth_rows(x, we_i, gamma, beta, wh, F)
        ti = t[:, i:i + 1]
        valid = jnp.isfinite(ti)
        gs = _depth_loss_grads(lf, ti, valid, kind=kind, delta=delta)
        dz = jnp.zeros((x.shape[0], C), jnp.float32)
        for f in range(F):
            dlog = scale * gs[f]
            whf = wh[f:f + 1, :].astype(jnp.float32)
            dz = dz + dlog * whf
            dwh_acc = dwh_acc.at[f:f + 1, :].add(
                jnp.sum(dlog * z, axis=0, keepdims=True)
            )
        dg_acc += jnp.sum(dz * xhat, axis=0, keepdims=True)
        db_acc += jnp.sum(dz, axis=0, keepdims=True)
        dzh = dz * gamma
        dh = rstd * (
            dzh
            - jnp.mean(dzh, axis=-1, keepdims=True)
            - xhat * jnp.mean(dzh * xhat, axis=-1, keepdims=True)
        )
        dh_lo = dh.astype(x.dtype)
        dx_acc += jax.lax.dot_general(
            dh_lo, we_i, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dwe.append(jax.lax.dot_general(
            x, dh_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
    return (dx_acc.astype(x.dtype), jnp.stack(dwe), dwh_acc, dg_acc, db_acc)


@functools.lru_cache(maxsize=None)
def _make_fused_depth(T: int, C: int, F: int, p: int, rblk: int, dtype_name: str,
                      kind: str, delta: float, interpret: bool, axes):
    """Depth twin of ``_make_fused``: loss num/den psum'd over ``axes`` (exact
    global masked mean); the emitted (T, p*F) predictions stay SHARD-LOCAL (they
    are this shard's token slice, which is exactly what the trainer's
    metric_update expects under sequence parallelism)."""
    from heal_swin_tpu.ops.vma_util import with_vma

    dtype = jnp.dtype(dtype_name)
    grid = (T // rblk,)
    kargs = dict(p=p, C=C, F=F, kind=kind, delta=delta)

    def _fwd_call(x, *rest):
        return pl.pallas_call(
            functools.partial(_fwd_kernel_depth, **kargs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((T, p * F), dtype),
            ], x),
            interpret=interpret,
        )(x, *rest)

    def _bwd_call(x, *rest):
        return pl.pallas_call(
            functools.partial(_bwd_kernel_depth, **kargs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((T, C), dtype),
                jax.ShapeDtypeStruct((p, C, C), jnp.float32),
                jax.ShapeDtypeStruct((F, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ], x),
            interpret=interpret,
        )(x, *rest)

    def _split_we(we, like_dtype):
        return we.reshape(C, p, C).transpose(1, 0, 2).astype(like_dtype)

    def _jnp_twin(x):
        return interpret and bool(getattr(jax.typeof(x), "vma", frozenset()))

    def _prep(x, we, gamma, beta, wh):
        from heal_swin_tpu.ops.vma_util import pcast_like

        return (
            pcast_like(_split_we(we, x.dtype), x),
            pcast_like(gamma.reshape(1, C).astype(jnp.float32), x),
            pcast_like(beta.reshape(1, C).astype(jnp.float32), x),
            pcast_like(wh.T.astype(x.dtype), x),  # (F, C) lane layout
        )

    def _run_fwd(x, we, gamma, beta, wh, t):
        call = (functools.partial(_jnp_fwd_depth, **kargs) if _jnp_twin(x)
                else _fwd_call)
        num, den, preds = call(x, *_prep(x, we, gamma, beta, wh), t)
        num, den = num[0, 0], den[0, 0]
        if axes:
            from heal_swin_tpu.parallel.sequence import psum_tree

            num, den = psum_tree((num, den), axes)
        den_s = jnp.maximum(den, 1.0)  # losses.py _masked_mean: max(cnt, 1)
        return num / den_s, den_s, preds

    @jax.custom_vjp
    def fused(x, we, gamma, beta, wh, t):
        loss, _, preds = _run_fwd(x, we, gamma, beta, wh, t)
        return loss, preds

    def fwd_rule(x, we, gamma, beta, wh, t):
        loss, den_s, preds = _run_fwd(x, we, gamma, beta, wh, t)
        return (loss, preds), (x, we, gamma, beta, wh, t, den_s)

    def bwd_rule(res, cts):
        # the emitted predictions are a metrics tap (the trainer's has_aux
        # output); like the seg confusion matrix they carry no gradient
        gloss, _ = cts
        x, we, gamma, beta, wh, t, den_s = res
        scale = (gloss / den_s).astype(jnp.float32).reshape(1, 1)
        from heal_swin_tpu.ops.vma_util import pcast_like

        call = (functools.partial(_jnp_bwd_depth, **kargs) if _jnp_twin(x)
                else _bwd_call)
        dx, dwe_r, dwh_t, dg, db = call(
            x, *_prep(x, we, gamma, beta, wh), t, pcast_like(scale, x)
        )
        dwe = dwe_r.transpose(1, 0, 2).reshape(C, p * C)
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dwe.astype(we.dtype), we),
                match_vma(dg.reshape(C).astype(gamma.dtype), gamma),
                match_vma(db.reshape(C).astype(beta.dtype), beta),
                match_vma(dwh_t.T.astype(wh.dtype), wh), None)

    fused.defvjp(fwd_rule, bwd_rule)
    return fused


def supported_depth(T: int, C: int, F: int, p: int, dtype) -> bool:
    return (
        jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32))
        and C % 8 == 0
        and F in (1, 2)
        and pick_rblk(T, C, p) is not None
    )


def fused_final_head_depth(x, we, gamma, beta, wh, target, *, patch_size: int,
                           loss_kind: str, huber_delta: float = 1.0,
                           rblk: int | None = None, interpret: bool = False,
                           axis_names=None):
    """Fused expand+LN+head+masked-depth-loss.  x: (T, C) tokens after norm_up;
    we/gamma/beta as in ``fused_final_head``; wh: (C, F) head kernel with F in
    (1, 2); target: (T, p) f32 network-space depths with inf = background.
    loss_kind: "l2" | "l1" | "huber" | "nll" (nll = mean_log_var_loss, needs F=2;
    with F=2 and a non-nll kind the logvar channel gets zero gradient — the
    reference's pre-``train_uncertainty_after`` phase).

    Returns (loss, preds (T, p*F) in x.dtype) where preds[:, i*F+f] is output
    channel f of sub-pixel i — reshape to (B, npix, F) for metric_update.  Loss
    equals training/losses.py on the unfused (T*p, F) output to f32 rounding.
    ``axis_names``: see fused_final_head (loss num/den psum'd; preds shard-local).
    """
    T, C = x.shape
    F = wh.shape[-1]
    p = patch_size
    if rblk is None:
        rblk = pick_rblk(T, C, p)
    if rblk is None:
        raise ValueError(f"fused_final_head_depth: no supported row block for T={T}")
    axes = tuple(axis_names) if axis_names is not None else None
    fn = _make_fused_depth(T, C, F, p, rblk, str(x.dtype), loss_kind,
                           float(huber_delta), interpret, axes)
    return fn(x, we, gamma, beta, wh, jnp.asarray(target, jnp.float32))


def pick_rblk(T: int, C: int, p: int) -> int | None:
    for rblk in (512, 256, 128):
        if T % rblk == 0:
            return rblk
    return None


def supported(T: int, C: int, F: int, p: int, dtype) -> bool:
    return (
        jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32))
        and C % 8 == 0
        and F <= 128
        and pick_rblk(T, C, p) is not None
    )


@functools.lru_cache(maxsize=None)
def _make_fused(T: int, C: int, F: int, p: int, rblk: int, dtype_name: str,
                interpret: bool, axes):
    """``axes``: optional tuple of mesh axis names.  When set, the weighted-CE
    numerator and denominator are psum'd over them before normalizing, so the loss
    is the exact GLOBAL weighted mean even though x/y/welem are device-local shards
    inside ``shard_map`` (training/trainer.py shard_map steps; the returned
    confusion matrix stays SHARD-LOCAL — the trainer psums metric increments
    itself).  The pallas out-shapes are vma-stamped per call (ops/vma_util.py) and
    the weight cotangents psum'd (parallel/sequence.py match_vma), as check_vma
    typing requires."""
    from heal_swin_tpu.ops.vma_util import with_vma

    dtype = jnp.dtype(dtype_name)
    grid = (T // rblk,)

    def _fwd_call(x, *rest):
        return pl.pallas_call(
            functools.partial(_fwd_kernel, p=p, C=C, F=F),
            grid=grid,
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F * F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, F * F), jnp.float32),
            ], x),
            interpret=interpret,
        )(x, *rest)

    def _bwd_call(x, *rest):
        return pl.pallas_call(
            functools.partial(_bwd_kernel, p=p, C=C, F=F),
            grid=grid,
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((p, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((T, C), dtype),
                jax.ShapeDtypeStruct((p, C, C), jnp.float32),
                jax.ShapeDtypeStruct((C, F), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ], x),
            interpret=interpret,
        )(x, *rest)

    def _split_we(we, like_dtype):
        # (C, p*C) flax layout -> (p, C, C): column block i -> leading index i
        return we.reshape(C, p, C).transpose(1, 0, 2).astype(like_dtype)

    def _jnp_twin(x):
        # pallas interpret inside shard_map(check_vma=True) fails vma typing in
        # the HLO interpreter; run the jnp twin of the kernel there (see _jnp_fwd)
        return interpret and bool(getattr(jax.typeof(x), "vma", frozenset()))

    def _run_fwd(x, we, gamma, beta, wh, y, welem):
        from heal_swin_tpu.ops.vma_util import pcast_like

        call = (functools.partial(_jnp_fwd, p=p, C=C, F=F) if _jnp_twin(x)
                else _fwd_call)
        num, den, cm = call(
            x, pcast_like(_split_we(we, x.dtype), x),
            pcast_like(gamma.reshape(1, C).astype(jnp.float32), x),
            pcast_like(beta.reshape(1, C).astype(jnp.float32), x),
            pcast_like(wh.astype(x.dtype), x), y, welem,
        )
        num, den = num[0, 0], den[0, 0]
        if axes:
            from heal_swin_tpu.parallel.sequence import psum_tree

            num, den = psum_tree((num, den), axes)
        den_s = jnp.maximum(den, 1e-12)
        return num / den_s, den_s, cm.reshape(F, F)

    @jax.custom_vjp
    def fused(x, we, gamma, beta, wh, y, welem):
        loss, _, cm = _run_fwd(x, we, gamma, beta, wh, y, welem)
        return loss, cm

    def fwd_rule(x, we, gamma, beta, wh, y, welem):
        loss, den_s, cm = _run_fwd(x, we, gamma, beta, wh, y, welem)
        return (loss, cm), (x, we, gamma, beta, wh, y, welem, den_s)

    def bwd_rule(res, cts):
        gloss, _ = cts  # the confusion matrix carries no gradient
        x, we, gamma, beta, wh, y, welem, den_s = res
        # gloss and den_s are mesh-invariant (the loss psums over ``axes``); the
        # per-element dlogits scale gloss/den_global is identical on every shard
        scale = (gloss / den_s).astype(jnp.float32).reshape(1, 1)
        from heal_swin_tpu.ops.vma_util import pcast_like

        call = (functools.partial(_jnp_bwd, p=p, C=C, F=F) if _jnp_twin(x)
                else _bwd_call)
        dx, dwe_r, dwh, dg, db = call(
            x, pcast_like(_split_we(we, x.dtype), x),
            pcast_like(gamma.reshape(1, C).astype(jnp.float32), x),
            pcast_like(beta.reshape(1, C).astype(jnp.float32), x),
            pcast_like(wh.astype(x.dtype), x), y, welem,
            pcast_like(scale, x),
        )
        dwe = dwe_r.transpose(1, 0, 2).reshape(C, p * C)
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dwe.astype(we.dtype), we),
                match_vma(dg.reshape(C).astype(gamma.dtype), gamma),
                match_vma(db.reshape(C).astype(beta.dtype), beta),
                match_vma(dwh.astype(wh.dtype), wh), None, None)

    fused.defvjp(fwd_rule, bwd_rule)
    return fused


def fused_final_head(x, we, gamma, beta, wh, y, welem, *, patch_size: int,
                     rblk: int | None = None, interpret: bool = False,
                     axis_names=None):
    """Fused expand+LN+head+CE.  x: (T, C) tokens after norm_up; we: (C, p*C)
    expand kernel (flax layout); gamma/beta: (C,) LN params; wh: (C, F) head
    kernel; y: (T, p) int32 targets; welem: (T, p) f32 per-element loss weights
    (class_weight[y] x optional sample mask).  Returns (loss, confmat (F, F) f32)
    where confmat[t, q] counts pixels with target t and argmax-pred q over ALL
    elements (the welem weighting applies to the loss only) — equal to the
    confusion matrix of argmax over the unfused (T*p, F) logits.

    ``axis_names``: mesh axes for sharded execution inside ``shard_map``
    (training/trainer.py shard_map steps): x/y/welem are this device's shard, the
    returned loss is the psum'd GLOBAL weighted mean (gradients handle the psum'd
    denominator exactly), and the returned confmat stays shard-local (callers psum
    metric increments — see parallel/sequence.py psum_tree)."""
    T, C = x.shape
    F = wh.shape[-1]
    p = patch_size
    if rblk is None:
        rblk = pick_rblk(T, C, p)
    if rblk is None:
        raise ValueError(f"fused_final_head: no supported row block for T={T}")
    axes = tuple(axis_names) if axis_names is not None else None
    fn = _make_fused(T, C, F, p, rblk, str(x.dtype), interpret, axes)
    return fn(x, we, gamma, beta, wh, jnp.asarray(y, jnp.int32),
              jnp.asarray(welem, jnp.float32))
