"""Analytic FLOPs counters for both model families.

The reference ships per-module ``flops()`` methods (swin_hp_transformer.py:179-190,
349-361,400-404,552-558,696-702,957-969 and swin_transformer.py:206-217,411-423,...)
that are encoder-only, count multiply-accumulates (not 2*MACs), and are bit-rotted for
the HP model (they read ``self.patches_resolution`` which SwinHPTransformerSys never
defines) — and nothing calls them.  We replace them with two config-level counters that
cover the FULL UNet (encoder + decoder + head), count true FLOPs (2 per MAC) for every
matmul, and are validated against XLA's own ``cost_analysis()`` in
tests/test_flops.py.  ``xla_flops`` exposes the compiler's exact count.
"""

from __future__ import annotations

from typing import Dict

import jax


def _attention_flops(n_windows: int, ws: int, dim: int, num_heads: int) -> int:
    """One W-MSA application over ``n_windows`` windows of ``ws`` tokens
    (counting the qkv projection, QK^T, AV and the output projection)."""
    hd = dim // num_heads
    per_window = (
        2 * ws * dim * 3 * dim          # qkv projection
        + 2 * num_heads * ws * hd * ws  # Q K^T
        + 2 * num_heads * ws * ws * hd  # A V
        + 2 * ws * dim * dim            # output projection
    )
    return n_windows * per_window


def _block_flops(n_tokens: int, dim: int, num_heads: int, ws: int, mlp_ratio: float) -> int:
    """One SWIN block: LN + W-MSA + LN + MLP (shift permutations are gathers, 0 FLOPs)."""
    hidden = int(dim * mlp_ratio)
    return (
        2 * n_tokens * dim                            # two layer norms
        + _attention_flops(n_tokens // ws, ws, dim, num_heads)
        + 2 * n_tokens * dim * hidden * 2             # MLP fc1 + fc2
    )


def swin_hp_flops(config, data_spec) -> Dict[str, int]:
    """Analytic forward FLOPs of SwinHPTransformerSys for one sample.

    Returns a breakdown dict with a ``total`` key.  ``config`` is a
    SwinHPTransformerConfig, ``data_spec`` a DataSpec with ``dim_in`` = npix.
    """
    cfg = config
    npix = int(data_spec.dim_in)
    p = cfg.patch_size
    E = cfg.embed_dim
    L = len(cfg.depths)
    num_patches = npix // p
    ws = cfg.window_size

    patch_embed = 2 * num_patches * (p * data_spec.f_in) * E + num_patches * E

    encoder = 0
    for i in range(L):
        n = num_patches // 4**i
        dim = E * 2**i
        encoder += cfg.depths[i] * _block_flops(n, dim, cfg.num_heads[i], ws, cfg.mlp_ratio)
        if i < L - 1:  # PatchMerging: LN(4C) + Dense(4C -> 2C)
            encoder += n * dim + 2 * (n // 4) * (4 * dim) * (2 * dim)
    num_features = E * 2 ** (L - 1)
    encoder += (num_patches // 4 ** (L - 1)) * num_features  # final encoder norm

    decoder = 0
    for inx in range(L):
        down_idx = L - 1 - inx
        dim = E * 2**down_idx
        n = num_patches // 4**down_idx
        if inx == 0:  # expand0: Dense(C -> 2C) + LN on 4n tokens of C/2
            decoder += 2 * n * dim * (2 * dim) + 4 * n * (dim // 2)
        else:
            decoder += 2 * n * (2 * dim) * dim  # concat_back_dim (bias ~0)
            decoder += cfg.depths[down_idx] * _block_flops(
                n, dim, cfg.num_heads[down_idx], ws, cfg.mlp_ratio
            )
            if down_idx > 0:  # upsample PatchExpand
                decoder += 2 * n * dim * (2 * dim) + 4 * n * (dim // 2)
    decoder += num_patches * E  # norm_up
    decoder += 2 * num_patches * E * (p * E) + npix * E  # FinalPatchExpand_X4 + LN

    head = 2 * npix * E * data_spec.f_out

    total = patch_embed + encoder + decoder + head
    return {
        "patch_embed": patch_embed,
        "encoder": encoder,
        "decoder": decoder,
        "head": head,
        "total": total,
    }


def swin_flat_flops(config, data_spec) -> Dict[str, int]:
    """Analytic forward FLOPs of SwinTransformerSys (flat baseline) for one sample.

    ``data_spec.dim_in`` is (H, W).  Mirrors the structure counted by the reference's
    swin_transformer.py flops() chain but covers the decoder too.
    """
    cfg = config.normalized() if hasattr(config, "normalized") else config
    H, W = data_spec.dim_in
    ph, pw = cfg.patch_size
    wh, ww = cfg.window_size
    ws = wh * ww
    E = cfg.embed_dim
    L = len(cfg.depths)
    pr = (H // ph, W // pw)
    num_patches = pr[0] * pr[1]

    patch_embed = 2 * num_patches * (ph * pw * data_spec.f_in) * E + num_patches * E

    encoder = 0
    for i in range(L):
        n = num_patches // 4**i
        dim = E * 2**i
        encoder += cfg.depths[i] * _block_flops(n, dim, cfg.num_heads[i], ws, cfg.mlp_ratio)
        if i < L - 1:
            encoder += n * dim + 2 * (n // 4) * (4 * dim) * (2 * dim)
    num_features = E * 2 ** (L - 1)
    encoder += (num_patches // 4 ** (L - 1)) * num_features

    decoder = 0
    for inx in range(L):
        down_idx = L - 1 - inx
        dim = E * 2**down_idx
        n = num_patches // 4**down_idx
        if inx == 0:
            decoder += 2 * n * dim * (2 * dim) + 4 * n * (dim // 2)
        else:
            decoder += 2 * n * (2 * dim) * dim
            decoder += cfg.depths[down_idx] * _block_flops(
                n, dim, cfg.num_heads[down_idx], ws, cfg.mlp_ratio
            )
            if down_idx > 0:
                decoder += 2 * n * dim * (2 * dim) + 4 * n * (dim // 2)
    decoder += num_patches * E
    decoder += 2 * num_patches * E * (ph * pw * E) + H * W * E  # FinalPatchExpand2D + LN

    head = 2 * H * W * E * data_spec.f_out

    total = patch_embed + encoder + decoder + head
    return {
        "patch_embed": patch_embed,
        "encoder": encoder,
        "decoder": decoder,
        "head": head,
        "total": total,
    }


def model_flops(model_config, data_spec) -> Dict[str, int]:
    """Dispatch on the model config: SwinHP* -> HP counter, Swin* -> flat counter."""
    name = type(model_config).__name__
    inner = getattr(model_config, "swin_hp_transformer_config", None)
    if inner is not None:
        return swin_hp_flops(inner, data_spec)
    inner = getattr(model_config, "swin_transformer_config", None)
    if inner is not None:
        return swin_flat_flops(inner, data_spec)
    if "HP" in name or not isinstance(data_spec.dim_in, tuple):
        return swin_hp_flops(model_config, data_spec)
    return swin_flat_flops(model_config, data_spec)


def xla_flops(fn, *args) -> float:
    """The compiler's own FLOPs count for ``fn(*args)`` (exact for the lowered HLO)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))
