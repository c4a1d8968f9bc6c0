"""Import reference-trained torch ``.pth`` weights into Flax states.

The reference's best results load pretrained backbones via partial
``state_dict`` grafts (``strict=False`` /intersect-keys semantics:
Models/generate_model.py:112-125, MRI_PET_OT_OT_per_epoch_attn.py:509-511,
fundus_swin_network.py:59-75). This module provides the TPU-side
equivalent for the 3D ResNet family: read a torch checkpoint (CPU torch,
baked into the image), convert layouts (OIDHW conv -> DHWIO, Linear
transpose, BN weight/bias/running_* -> scale/bias/mean/var) and graft the
intersecting, shape-matching subset into a Flax param tree — reporting
what loaded and what was skipped, exactly the reference's partial-load
behaviour.

Supported torch naming schemes (both used by the reference):
  * backbone:   stem.0 / stem.1, layer{1-4}.{i}.conv{1-3}/bn{1-3},
                downsample.0/.1 (ResNet3D_Backbone, attn:483-545)
  * classifier: conv1 / bn1 + the same layer blocks + fc
                (ResNet3D, 3D_resnet.py:341-440)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

from otfusion_tpu.models.resnet3d import DEPTH_CONFIGS


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Read a ``.pth``/``.pt`` file into {name: float32 ndarray}.

    Unwraps the reference's checkpoint-dict format ({'model_state_dict':
    ...}, MRI_PET_OT.py:1115-1129) and strips DataParallel's ``module.``
    prefix (generate_model.py:100-108)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in
        raise ImportError(
            "importing .pth weights requires torch (CPU build is "
            "sufficient)") from e

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model_state_dict", "state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out = {}
    for name, tensor in obj.items():
        if name.startswith("module."):
            name = name[len("module."):]
        if hasattr(tensor, "detach"):
            out[name] = np.asarray(
                tensor.detach().to(torch.float32).numpy())
    return out


def _conv(sd, name):
    w = sd.get(name + ".weight")
    if w is None or w.ndim != 5:
        return None
    # torch Conv3d (O, I, kD, kH, kW) -> flax (kD, kH, kW, I, O)
    return {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}


def _bn(sd, name):
    if name + ".weight" not in sd:
        return None, None
    params = {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}
    stats = {"mean": sd[name + ".running_mean"],
             "var": sd[name + ".running_var"]}
    return params, stats


def resnet3d_tree_from_torch(
    state_dict: Dict[str, np.ndarray],
    depth: int,
    s2d_stem: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a reference ResNet3D(-Backbone) torch state dict onto the Flax
    ``ResNet3DBackbone`` tree layout: (params_subtree, batch_stats_subtree)
    containing ONLY the entries found in the state dict (partial-graft
    semantics; missing modules are simply absent).

    ``s2d_stem=True`` additionally rewrites the k=(3,7,7) stride-(1,2,2)
    stem kernel onto the space-to-depth stem's k=(3,4,4) layout
    (models/resnet3d.py:s2d_stem_kernel — an exact weight-space
    equivalence, so torch-pretrained parity survives the faster stem)."""
    layers, kind = DEPTH_CONFIGS[depth]
    n_convs = 3 if kind == "bottleneck" else 2
    block_cls = "Bottleneck3D" if kind == "bottleneck" else "BasicBlock3D"

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(module, conv, bn_p, bn_s):
        entry_p, entry_s = {}, {}
        if conv is not None:
            entry_p["Conv_0"] = conv
        if bn_p is not None:
            entry_p["BatchNorm_0"] = bn_p
            entry_s["BatchNorm_0"] = bn_s
        if entry_p:
            params[module] = entry_p
        if entry_s:
            stats[module] = entry_s

    # Stem: backbone scheme (stem.0/stem.1) or classifier scheme (conv1/bn1)
    if "stem.0.weight" in state_dict:
        stem_conv, stem_bn = "stem.0", "stem.1"
    else:
        stem_conv, stem_bn = "conv1", "bn1"
    bn_p, bn_s = _bn(state_dict, stem_bn)
    stem = _conv(state_dict, stem_conv)
    if s2d_stem and stem is not None and stem["kernel"].shape[1:3] == (7, 7):
        from otfusion_tpu.models.resnet3d import s2d_stem_kernel

        stem = {"kernel": s2d_stem_kernel(stem["kernel"])}
    put("_ConvBN_0", stem, bn_p, bn_s)

    g = 0  # flax auto-numbered global block index
    for stage, n_blocks in enumerate(layers):
        for i in range(n_blocks):
            t = f"layer{stage + 1}.{i}"
            block: Dict[str, Any] = {}
            block_s: Dict[str, Any] = {}
            for c in range(n_convs):
                conv = _conv(state_dict, f"{t}.conv{c + 1}")
                bn_p, bn_s = _bn(state_dict, f"{t}.bn{c + 1}")
                if conv is None and bn_p is None:
                    continue
                sub_p, sub_s = {}, {}
                if conv is not None:
                    sub_p["Conv_0"] = conv
                if bn_p is not None:
                    sub_p["BatchNorm_0"] = bn_p
                    sub_s["BatchNorm_0"] = bn_s
                block[f"_ConvBN_{c}"] = sub_p
                if sub_s:
                    block_s[f"_ConvBN_{c}"] = sub_s
            ds_conv = _conv(state_dict, f"{t}.downsample.0")
            ds_bn_p, ds_bn_s = _bn(state_dict, f"{t}.downsample.1")
            if ds_conv is not None or ds_bn_p is not None:
                sub_p, sub_s = {}, {}
                if ds_conv is not None:
                    sub_p["Conv_0"] = ds_conv
                if ds_bn_p is not None:
                    sub_p["BatchNorm_0"] = ds_bn_p
                    sub_s["BatchNorm_0"] = ds_bn_s
                block[f"_ConvBN_{n_convs}"] = sub_p
                if sub_s:
                    block_s[f"_ConvBN_{n_convs}"] = sub_s
            if block:
                params[f"{block_cls}_{g}"] = block
            if block_s:
                stats[f"{block_cls}_{g}"] = block_s
            g += 1
    return params, stats


def _graft(dst: Dict[str, Any], src: Dict[str, Any], path, loaded, skipped):
    """Recursively copy src leaves into dst where the key exists and the
    shape matches (reference intersect-keys partial load,
    generate_model.py:112-125)."""
    for key, val in src.items():
        where = path + (key,)
        if key not in dst:
            skipped.append("/".join(where) + " (missing in model)")
            continue
        if isinstance(val, dict):
            _graft(dst[key], val, where, loaded, skipped)
        elif np.shape(dst[key]) != np.shape(val):
            skipped.append(
                "/".join(where)
                + f" (shape {np.shape(val)} vs {np.shape(dst[key])})")
        else:
            dst[key] = np.asarray(val, np.float32)
            loaded.append("/".join(where))


def graft_torch_resnet3d(
    state,
    pth_path: str | Path,
    target_module: str,
    depth: int,
    verbose: bool = True,
):
    """Graft a reference ``.pth`` 3D-ResNet into ``state.params[
    target_module]`` (e.g. "mri_backbone" / "backbone"). Returns the new
    state; prints a loaded/skipped report like strict=False does not."""
    import jax

    sd = load_torch_state_dict(pth_path)
    # Detect a space-to-depth-stem target from the model's own stem shape
    # and rewrite the torch stem kernel onto it (lossless equivalence).
    s2d = False
    try:
        dst_stem = state.params[target_module]["_ConvBN_0"]["Conv_0"][
            "kernel"]
        s2d = np.shape(dst_stem)[1:3] == (4, 4)
    except (KeyError, TypeError):
        pass
    src_p, src_s = resnet3d_tree_from_torch(sd, depth, s2d_stem=s2d)

    # tree_map rebuilds every container, so in-place grafting below never
    # aliases the original state's trees.
    new_params = jax.tree_util.tree_map(np.asarray, dict(state.params))
    new_stats = jax.tree_util.tree_map(np.asarray, dict(state.batch_stats))
    loaded: list = []
    skipped: list = []
    if target_module not in new_params:
        raise KeyError(
            f"{target_module!r} not in model params "
            f"({list(new_params)})")
    _graft(new_params[target_module], src_p, (target_module,), loaded,
           skipped)
    if target_module in new_stats:
        _graft(new_stats[target_module], src_s, (target_module,), loaded,
               skipped)
    if verbose:
        print(f"Grafted {len(loaded)} tensors from {pth_path} into "
              f"{target_module}; skipped {len(skipped)}")
        for s in skipped[:10]:
            print(f"  skipped: {s}")
    if not loaded:
        raise ValueError(
            f"no tensors from {pth_path} matched the {target_module} "
            f"tree — wrong depth ({depth}) or architecture?")
    return state.replace(params=new_params, batch_stats=new_stats)
