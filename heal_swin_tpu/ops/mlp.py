"""Fused two-layer MLP backward (Pallas TPU kernel) + XLA forward.

The SWIN block MLP (reference Mlp, swin_hp_transformer.py:21-44: fc1 -> GELU -> fc2).
Profiler measurements at the paper's stage shapes (see docs/PERFORMANCE.md) show XLA
already fuses the FORWARD to the memory roofline (0.34 ms at T=262144, C=96), but its
BACKWARD materializes the (T, 4C) hidden + dhidden in HBM and runs ~2x slower than
the FLOP roofline there (1.48 ms vs the Pallas kernel's 0.79 ms, which sits at the
MXU bound for its 5 matmuls).  So the production path is a custom VJP: plain jnp
forward (XLA-fused), flash-style Pallas backward that saves only the inputs,
recomputes the hidden in VMEM per ``rblk``-row block, and emits dx per block plus
grid-accumulated dW1/db1/dW2/db2 (f32, constant-index output blocks — the TPU grid is
sequential so the accumulation is race-free).

The all-Pallas forward kernel is kept for microbenches (``fwd_impl='pallas'``).

Gates (``supported``): the Pallas backward only wins at C=96 (at C>=192 the XLA
backward is at parity or better — measured, benchmarks/mlp_prof_bench.py), and exact
erf GELU does not lower in Mosaic, so only the tanh approximation (``gelu_approx``)
is eligible on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heal_swin_tpu.ops.vma_util import with_vma

_SQRT_2_OVER_PI = 0.7978845608028654
_TANH_C = 0.044715
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_f32(h, approximate: bool):
    if approximate:
        u = _SQRT_2_OVER_PI * (h + _TANH_C * h * h * h)
        return 0.5 * h * (1.0 + jnp.tanh(u))
    return 0.5 * h * (1.0 + jax.lax.erf(h * _INV_SQRT2))


def _gelu_grad_f32(h, approximate: bool):
    if approximate:
        u = _SQRT_2_OVER_PI * (h + _TANH_C * h * h * h)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _TANH_C * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du
    cdf = 0.5 * (1.0 + jax.lax.erf(h * _INV_SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * h * h)
    return cdf + h * pdf


def reference_mlp(x, w1, b1, w2, b2, *, approximate: bool):
    """Pure-jnp oracle on the kernel's operand layout (x: (T, C), f32 accumulation)."""
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    g = _gelu_f32(h, approximate).astype(x.dtype)
    o = jnp.dot(g, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)
    return o.astype(x.dtype)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, approximate):
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...]
    g = _gelu_f32(h, approximate).astype(x_ref.dtype)
    o = jax.lax.dot_general(
        g, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o = o + b2_ref[...]
    out_ref[...] = o.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, dout_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, approximate):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    h = jax.lax.dot_general(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + b1_ref[...]
    g = _gelu_f32(h, approximate).astype(x.dtype)

    do = dout_ref[...]
    dof = do.astype(jnp.float32)
    # dG[r] = dO[r] W2^T
    dg = jax.lax.dot_general(
        do, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = dg * _gelu_grad_f32(h, approximate)
    dh_lo = dh.astype(x.dtype)
    dx = jax.lax.dot_general(
        dh_lo, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)

    dw1_ref[...] += jax.lax.dot_general(
        x, dh_lo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        g, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(dof, axis=0, keepdims=True)


@functools.lru_cache(maxsize=None)
def _make_pallas_bwd(C: int, H: int, approximate: bool, rblk: int, dtype_name: str,
                     interpret: bool):
    dtype = jnp.dtype(dtype_name)

    def pallas_bwd(x, w1, b1, w2, b2, dout):
        T = x.shape[0]
        dx, dw1, db1, dw2, db2 = pl.pallas_call(
            functools.partial(_bwd_kernel, approximate=approximate),
            grid=(T // rblk,),
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((T, C), dtype),
                jax.ShapeDtypeStruct((C, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((H, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ], x),
            interpret=interpret,
        )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C), dout)
        return dx, dw1, db1.reshape(H), dw2, db2.reshape(C)

    return pallas_bwd


@functools.lru_cache(maxsize=None)
def _make_fused(C: int, H: int, approximate: bool, rblk: int, dtype_name: str,
                interpret: bool, fwd_impl: str):
    dtype = jnp.dtype(dtype_name)
    pallas_bwd = _make_pallas_bwd(C, H, approximate, rblk, dtype_name, interpret)

    def pallas_fwd(x, w1, b1, w2, b2):
        T = x.shape[0]
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, approximate=approximate),
            grid=(T // rblk,),
            in_specs=[
                pl.BlockSpec((rblk, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rblk, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=with_vma(jax.ShapeDtypeStruct((T, C), dtype), x),
            interpret=interpret,
        )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C))
        return out

    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2):
        if fwd_impl == "xla":
            return reference_mlp(x, w1, b1, w2, b2, approximate=approximate)
        return pallas_fwd(x, w1, b1, w2, b2)

    def fwd(x, w1, b1, w2, b2):
        return fused(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def bwd(res, g):
        x, w1, b1, w2, b2 = res
        dx, dw1, db1, dw2, db2 = pallas_bwd(x, w1, b1, w2, b2, g.astype(dtype))
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dw1.astype(w1.dtype), w1),
                match_vma(db1.astype(b1.dtype), b1),
                match_vma(dw2.astype(w2.dtype), w2),
                match_vma(db2.astype(b2.dtype), b2))

    fused.defvjp(fwd, bwd)
    return fused


def pick_rblk(T: int, C: int, H: int) -> int | None:
    """Largest row-block that divides T and keeps the f32 hidden + dW accumulators
    inside the ~16 MB scoped VMEM (measured caps, same methodology as the attention
    kernel's wblk)."""
    # budget: h f32 (rblk, H) + g bf16 + double-buffered x/out/dx blocks (rblk, C) +
    # weight consts (C,H)+(H,C) bf16 + dW accums f32.  C >= 768 puts the dW
    # accumulators alone at 9.4 MB x2 — fused path is gated off there by the caller.
    for r in (512, 256, 128, 64, 32, 16, 8):
        if T % r != 0:
            continue
        if r * H * 4 + r * H * 2 > 6 * 1024 * 1024:
            continue
        return r
    return None


@functools.lru_cache(maxsize=None)
def _make_fused_nd(C: int, H: int, approximate: bool, rblk: int, dtype_name: str,
                   interpret: bool):
    """N-D variant for in-model use: the PRIMAL is the exact jnp ops of the plain
    dense path on the native (..., C) shape — identical HLO, so XLA keeps its layout
    choices and fusions around the MLP (a flat (T, C) primal measured +7 ms/step of
    layout copies at paper scale) — and only the backward flattens for the Pallas
    kernel."""
    dtype = jnp.dtype(dtype_name)
    pallas_bwd = _make_pallas_bwd(C, H, approximate, rblk, dtype_name, interpret)

    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2):
        h = jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
        g = jax.nn.gelu(h, approximate=approximate)
        return jnp.dot(g, w2.astype(x.dtype)) + b2.astype(x.dtype)

    def fwd(x, w1, b1, w2, b2):
        return fused(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)

    def bwd(res, g):
        x, w1, b1, w2, b2 = res
        T = 1
        for d in x.shape[:-1]:
            T *= d
        dx, dw1, db1, dw2, db2 = pallas_bwd(
            x.reshape(T, C), w1.astype(dtype), b1.astype(jnp.float32),
            w2.astype(dtype), b2.astype(jnp.float32), g.reshape(T, C).astype(dtype)
        )
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx.reshape(x.shape), match_vma(dw1.astype(w1.dtype), w1),
                match_vma(db1.astype(b1.dtype), b1),
                match_vma(dw2.astype(w2.dtype), w2),
                match_vma(db2.astype(b2.dtype), b2))

    fused.defvjp(fwd, bwd)
    return fused


def fused_mlp_nd(x, w1, b1, w2, b2, *, approximate: bool, rblk: int | None = None,
                 interpret: bool = False):
    """In-model entry point: x has shape (..., C); forward is plain jnp on the native
    shape, backward is the Pallas kernel on the flattened view."""
    C = x.shape[-1]
    H = w1.shape[1]
    T = 1
    for d in x.shape[:-1]:
        T *= d
    if rblk is None:
        rblk = pick_rblk(T, C, H)
    if rblk is None:
        raise ValueError(f"fused_mlp_nd: no supported row block for (T={T}, C={C}, "
                         f"H={H}); gate calls with ops.mlp.supported()")
    fn = _make_fused_nd(C, H, approximate, rblk, str(x.dtype), interpret)
    return fn(x, w1, b1, w2, b2)


def supported(backend: str, T: int, C: int, H: int, approximate: bool) -> bool:
    """True where the hybrid path measurably beats plain XLA (see module docstring)."""
    if backend != "tpu":
        return False
    if not approximate:  # exact-erf GELU does not lower in Mosaic
        return False
    if C > 96:  # XLA's backward reaches parity from C=192 up (measured)
        return False
    return pick_rblk(T, C, H) is not None


def fused_mlp(x, w1, b1, w2, b2, *, approximate: bool, rblk: int | None = None,
              interpret: bool = False, fwd_impl: str = "xla"):
    """Fused fc1 -> GELU -> fc2.  x: (T, C); w1: (C, H); b1: (H,); w2: (H, C);
    b2: (C,).  Returns (T, C) in x.dtype.

    ``fwd_impl='xla'`` (production): jnp forward, Pallas backward.
    ``fwd_impl='pallas'``: all-Pallas (microbenches)."""
    T, C = x.shape
    H = w1.shape[1]
    if rblk is None:
        rblk = pick_rblk(T, C, H)
    if rblk is None:
        raise ValueError(f"fused_mlp: no supported row block for (T={T}, C={C}, "
                         f"H={H}); gate calls with ops.mlp.supported()")
    fn = _make_fused(C, H, approximate, rblk, str(x.dtype), interpret, fwd_impl)
    return fn(x, w1.astype(x.dtype), b1.astype(jnp.float32),
              w2.astype(x.dtype), b2.astype(jnp.float32))


# ---------------------------------------------------------------------------------
# Whole-MLP-branch kernel: z = x + dscale * LN(mlp(x))   (SWIN-v2 res-post-norm)
#
# The branch is fully token-local (no shift crosses it), so residual + DropPath
# scale + LayerNorm + both dense layers fuse into ONE kernel, forward and backward.
# The earlier hybrid (XLA fwd / Pallas bwd MLP alone) was a wash because the
# custom-VJP boundary forced conv-layout -> row-major copies of x/dout/dx; fusing
# the WHOLE branch moves the boundary to the block edge where the residual add
# lives, and the backward recomputes everything in VMEM (flash style) while
# grid-accumulating dW1/db1/dW2/db2/dgamma/dbeta.
# ---------------------------------------------------------------------------------


def reference_mlp_block(x, w1, b1, w2, b2, gamma, beta, dscale, *, approximate,
                        ln_eps=1e-5):
    """Pure-jnp oracle: x + dscale * LN(mlp(x)).  dscale: (T, 1) f32 or None.
    Computed in f32 exactly as the kernel does (no intermediate down-cast of u)."""
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = h + b1.astype(jnp.float32)
    g = _gelu_f32(h, approximate).astype(x.dtype)
    u = jnp.dot(g, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    u = u + b2.astype(jnp.float32)
    mean = jnp.mean(u, axis=-1, keepdims=True)
    xc = u - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + ln_eps) * gamma + beta
    if dscale is not None:
        y = y * dscale
    return (x.astype(jnp.float32) + y).astype(x.dtype)


def _blk_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, ds_ref,
                    out_ref, *, approximate, ln_eps, has_dp):
    f32 = jnp.float32
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    h = h + b1_ref[...]
    g = _gelu_f32(h, approximate).astype(x.dtype)
    u = jax.lax.dot_general(g, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    u = u + b2_ref[...]
    mean = jnp.mean(u, axis=-1, keepdims=True)
    xc = u - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + ln_eps) * g_ref[...] + be_ref[...]
    if has_dp:
        y = y * ds_ref[...]
    out_ref[...] = (x.astype(f32) + y).astype(out_ref.dtype)


def _blk_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, ds_ref,
                    dz_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
                    dbe_ref, *, approximate, ln_eps, has_dp):
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    x = x_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    h = h + b1_ref[...]
    g = _gelu_f32(h, approximate).astype(x.dtype)
    u = jax.lax.dot_general(g, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    u = u + b2_ref[...]
    mean = jnp.mean(u, axis=-1, keepdims=True)
    xc = u - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + ln_eps)
    xhat = xc * rstd

    dzf = dz_ref[...].astype(f32)
    dy = dzf * ds_ref[...] if has_dp else dzf
    dg_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dgl = dy * g_ref[...]
    du = rstd * (
        dgl
        - jnp.mean(dgl, axis=-1, keepdims=True)
        - xhat * jnp.mean(dgl * xhat, axis=-1, keepdims=True)
    )
    du_lo = du.astype(x.dtype)
    dw2_ref[...] += jax.lax.dot_general(g, du_lo, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
    db2_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dgact = jax.lax.dot_general(du_lo, w2, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32)
    dh = dgact * _gelu_grad_f32(h, approximate)
    dh_lo = dh.astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(x, dh_lo, (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dx = dzf + jax.lax.dot_general(dh_lo, w1, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_mlp_block(C: int, H: int, approximate: bool, ln_eps: float, has_dp: bool,
                    rblk: int, bwd_rblk: int, dtype_name: str, interpret: bool):
    dtype = jnp.dtype(dtype_name)

    def const_specs():
        return [
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]

    def pallas_fwd(x, w1, b1, w2, b2, gamma, beta, dscale):
        T = x.shape[0]
        kernel = functools.partial(_blk_fwd_kernel, approximate=approximate,
                                   ln_eps=ln_eps, has_dp=has_dp)
        return pl.pallas_call(
            kernel,
            grid=(T // rblk,),
            in_specs=[pl.BlockSpec((rblk, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + const_specs(),
            out_specs=pl.BlockSpec((rblk, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=with_vma(jax.ShapeDtypeStruct((T, C), dtype), x),
            interpret=interpret,
        )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C),
          gamma.reshape(1, C).astype(jnp.float32),
          beta.reshape(1, C).astype(jnp.float32), dscale)

    def pallas_bwd_call(x, w1, b1, w2, b2, gamma, beta, dscale, dz):
        T = x.shape[0]
        rb = bwd_rblk
        kernel = functools.partial(_blk_bwd_kernel, approximate=approximate,
                                   ln_eps=ln_eps, has_dp=has_dp)
        const = [
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(T // rb,),
            in_specs=[pl.BlockSpec((rb, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + const + [
                pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((rb, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=with_vma([
                jax.ShapeDtypeStruct((T, C), dtype),
                jax.ShapeDtypeStruct((C, H), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((H, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ], x),
            interpret=interpret,
        )(x, w1, b1.reshape(1, H), w2, b2.reshape(1, C),
          gamma.reshape(1, C).astype(jnp.float32),
          beta.reshape(1, C).astype(jnp.float32), dscale, dz)

    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2, gamma, beta, dscale):
        return pallas_fwd(x, w1, b1, w2, b2, gamma, beta, dscale)

    def fwd(*args):
        return fused(*args), args

    def bwd(res, g):
        x, w1, b1, w2, b2, gamma, beta, dscale = res
        dx, dw1, db1, dw2, db2, dg, dbe = pallas_bwd_call(
            x, w1, b1, w2, b2, gamma, beta, dscale, g.astype(dtype))
        from heal_swin_tpu.parallel.sequence import match_vma

        return (dx, match_vma(dw1.astype(w1.dtype), w1),
                match_vma(db1.reshape(b1.shape).astype(b1.dtype), b1),
                match_vma(dw2.astype(w2.dtype), w2),
                match_vma(db2.reshape(b2.shape).astype(b2.dtype), b2),
                match_vma(dg.reshape(gamma.shape), gamma),
                match_vma(dbe.reshape(beta.shape), beta),
                jnp.zeros_like(dscale))

    fused.defvjp(fwd, bwd)
    return fused


def pick_block_rblks(T: int, C: int, H: int):
    """(fwd_rblk, bwd_rblk) for the MLP-branch kernel, or None.  The backward holds
    the f32 hidden + dW accumulators (measured caps, benchmarks/mlp_block_probe.py)."""
    if C > 384:  # dW accumulators alone exceed scoped VMEM at C=768
        return None
    fwd_cap = 512
    bwd_cap = {96: 512, 192: 256, 384: 128}.get(C, 128)
    fw, bw = fwd_cap, bwd_cap
    while fw > 8 and T % fw != 0:
        fw //= 2
    while bw > 8 and T % bw != 0:
        bw //= 2
    if T % fw != 0 or T % bw != 0:
        return None
    return fw, bw


def block_supported(backend: str, T: int, C: int, H: int, approximate: bool) -> bool:
    if backend != "tpu":
        return False
    if not approximate:  # exact-erf GELU does not lower in Mosaic
        return False
    return pick_block_rblks(T, C, H) is not None


def fused_mlp_block(x, w1, b1, w2, b2, gamma, beta, dscale=None, *,
                    approximate: bool, ln_eps: float = 1e-5,
                    rblks=None, interpret: bool = False):
    """z = x + dscale * LN(mlp(x)) fused.  x: (T, C); dscale: (T, 1) f32 or None
    (None = no DropPath scaling).  Returns (T, C) in x.dtype."""
    T, C = x.shape
    H = w1.shape[1]
    if rblks is None:
        rblks = pick_block_rblks(T, C, H)
    if rblks is None:
        raise ValueError(f"fused_mlp_block: no supported row blocks for (T={T}, "
                         f"C={C}, H={H}); gate calls with ops.mlp.block_supported()")
    fw, bw = rblks
    has_dp = dscale is not None
    if dscale is None:
        dscale = jnp.ones((T, 1), jnp.float32)
    fn = _make_mlp_block(C, H, approximate, float(ln_eps), has_dp, fw, bw,
                         str(x.dtype), interpret)
    return fn(x, w1.astype(x.dtype), b1.astype(jnp.float32), w2.astype(x.dtype),
              b2.astype(jnp.float32), gamma, beta, dscale)
