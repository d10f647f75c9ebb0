"""Test-only oracle: imports the torch reference models from /root/reference (read-only)
to check numerical parity of the JAX reimplementation via weight copying.

The reference needs timm (DropPath, trunc_normal_) and healpy; neither is installed.
We stub timm with equivalent minimal torch code (identity DropPath in eval — all parity
tests run in eval mode) and healpy with our own healpix module.  Reference code is only
*executed* as an oracle here, never copied into the framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np


def install_stubs_and_reference():
    import torch
    import torch.nn as tnn

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(tnn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if not self.training or self.drop_prob == 0.0:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x / keep * mask

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std, b * std)
            return tensor

        layers.DropPath = DropPath
        layers.trunc_normal_ = trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "healpy" not in sys.modules:
        from heal_swin_tpu.ops import healpix as hpx

        healpy = types.ModuleType("healpy")
        pixelfunc = types.ModuleType("healpy.pixelfunc")
        for name in ["ring2nest", "nest2ring", "pix2ang", "pix2vec", "ang2pix",
                     "nside2npix", "isnsideok", "get_interp_weights", "get_interp_val"]:
            fn = getattr(hpx, name, None)
            if fn is not None:
                setattr(healpy, name, fn)
                setattr(pixelfunc, name, fn)
        healpy.pixelfunc = pixelfunc
        sys.modules["healpy"] = healpy
        sys.modules["healpy.pixelfunc"] = pixelfunc

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def _t(sd, key):
    return sd[key].detach().cpu().numpy()


def _map_hp_path(path: str):
    """flax param path -> (torch state_dict key, transform fn) for the HP model."""
    parts = path.split("/")

    def seg_to_torch(parts):
        out = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p.startswith("layer_up"):
                out.append(f"layers_up.{p[len('layer_up'):]}")
            elif p.startswith("layer"):
                out.append(f"layers.{p[len('layer'):]}")
            elif p.startswith("block"):
                out.append(f"blocks.{p[len('block'):]}")
            elif p.startswith("concat_back_dim"):
                out.append(f"concat_back_dim.{p[len('concat_back_dim'):]}")
            elif p == "expand0":
                out.append("layers_up.0")
            elif p == "ln":
                pass  # our LayerNorm wrapper level
            else:
                out.append(p)
            i += 1
        return out

    leaf = parts[-1]
    body = seg_to_torch(parts[:-1])
    tbody = ".".join(body)

    if leaf == "kernel":
        if parts[0] == "patch_embed" and parts[1] == "proj":
            # Conv1d (e, c, p) -> Dense (p*c, e)
            return "patch_embed.proj.weight", lambda w: w.transpose(2, 1, 0).reshape(-1, w.shape[0])
        if parts[-2] == "output":
            # Conv1d k=1 (f_out, e, 1) -> Dense (e, f_out)
            return tbody + ".weight", lambda w: w[:, :, 0].T
        return tbody + ".weight", lambda w: w.T
    if leaf == "bias":
        return tbody + ".bias", lambda b: b
    if leaf == "scale":  # our LayerNorm scale
        return tbody + ".weight", lambda w: w
    if leaf in ("relative_position_bias_table", "logit_scale"):
        return tbody + ("." if tbody else "") + leaf, lambda w: w
    if leaf == "absolute_pos_embed":
        return "absolute_pos_embed", lambda w: w
    raise KeyError(path)


def _map_flat_path(path: str):
    """flax param path -> (torch key, transform) for the flat model."""
    parts = path.split("/")

    def conv2d_to_dense(w):  # (e, c, kh, kw) -> (kh*kw*c, e)
        return w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])

    out = []
    for p in parts[:-1]:
        if p == "ln":
            continue
        if p == "patch_embed_proj":
            out.append("patch_embed.proj")
        elif p == "patch_embed_norm":
            out.append("patch_embed.norm")
        elif p == "expand0":
            out.append("layers_up.0")
        elif p.startswith("layer_up") and "_block" in p:
            a, b = p.split("_block")
            out.append(f"layers_up.{a[len('layer_up'):]}.blocks.{b}")
        elif p.startswith("layer") and "_block" in p:
            a, b = p.split("_block")
            out.append(f"layers.{a[len('layer'):]}.blocks.{b}")
        elif p.startswith("downsample"):
            out.append(f"layers.{p[len('downsample'):]}.downsample")
        elif p.startswith("upsample"):
            out.append(f"layers_up.{p[len('upsample'):]}.upsample")
        elif p.startswith("concat_back_dim"):
            out.append(f"concat_back_dim.{p[len('concat_back_dim'):]}")
        else:
            out.append(p)
    tbody = ".".join(out)
    leaf = parts[-1]

    if leaf == "kernel":
        if parts[0] == "patch_embed_proj":
            return "patch_embed.proj.weight", conv2d_to_dense
        if parts[-2] == "output":
            return "output.weight", lambda w: w[:, :, 0, 0].T
        return tbody + ".weight", lambda w: w.T
    if leaf == "bias":
        return tbody + ".bias", lambda b: b
    if leaf == "scale":
        return tbody + ".weight", lambda w: w
    if leaf in ("relative_position_bias_table", "logit_scale"):
        return tbody + ("." if tbody else "") + leaf, lambda w: w
    if leaf == "absolute_pos_embed":
        return "absolute_pos_embed", lambda w: w
    raise KeyError(path)


def copy_torch_weights(torch_model, flax_params, mapper):
    """Return flax params filled with the torch model's weights."""
    import flax

    sd = {k: v.detach().cpu().numpy() for k, v in torch_model.state_dict().items()}
    flat = flax.traverse_util.flatten_dict(flax_params["params"], sep="/")
    new = {}
    used = set()
    for path, val in flat.items():
        tkey, tf = mapper(path)
        assert tkey in sd, f"missing torch key {tkey} for flax path {path}"
        arr = tf(sd[tkey])
        assert arr.shape == val.shape, f"{path}: {arr.shape} vs {val.shape} (torch {tkey})"
        # own the memory: .numpy() and transpose transforms are VIEWS of the live
        # torch parameters, which trajectory tests mutate in-place after copying
        new[path] = np.array(arr, dtype=np.float32, copy=True)
        used.add(tkey)
    unused = {
        k for k in sd
        if k not in used and "relative_position_index" not in k and "attn_mask" not in k
    }
    assert not unused, f"torch params not consumed: {sorted(unused)}"
    return {"params": flax.traverse_util.unflatten_dict(new, sep="/")}
