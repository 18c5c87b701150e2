"""Torch checkpoint -> flax parameter-tree conversion.

Enables loading pretrained reference weights (DINOv2 ViT image encoder,
the MapAnything trunk/heads) into this framework. Conversion rules:

  - Linear: torch (out, in) weight -> flax (in, out) kernel;
  - Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out);
  - ConvTranspose2d: torch (in, out, kh, kw) -> flax (kh, kw, in, out);
  - LayerNorm: weight/bias -> scale/bias;
  - DINOv2 block naming (blocks.N.attn.qkv...) -> our block_N/attn/qkv...

Works on any torch state-dict-like mapping of numpy arrays (load with
``torch.load(..., map_location="cpu")`` or ``numpy.load``); no torch
import required unless reading a .pth file.

Parity purpose: the reference pulls DINOv2 from torch hub
(``uniception/models/encoders/dinov2.py:15``) and loads staged checkpoints
(``model.py:636-666``); this module is the bridge for those artifacts.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping, Optional

import numpy as np


def _t(x):
    return np.asarray(x)


def linear(w, b=None):
    out = {"kernel": _t(w).T}
    if b is not None:
        out["bias"] = _t(b)
    return out


def conv2d(w, b=None):
    out = {"kernel": _t(w).transpose(2, 3, 1, 0)}
    if b is not None:
        out["bias"] = _t(b)
    return out


def conv_transpose2d(w, b=None):
    # torch: (in, out, kh, kw) -> flax ConvTranspose: (kh, kw, in, out)
    out = {"kernel": _t(w).transpose(2, 3, 0, 1)}
    if b is not None:
        out["bias"] = _t(b)
    return out


def layer_norm(w, b):
    return {"scale": _t(w), "bias": _t(b)}


def convert_dinov2_vit(state: Mapping[str, np.ndarray]) -> Dict:
    """DINOv2 torch-hub ViT state dict -> our ``ViTEncoder`` param tree.

    Handles: patch_embed.proj, cls_token, pos_embed, register_tokens,
    blocks.N.{norm1, attn.qkv, attn.proj, ls1.gamma, norm2,
    mlp.fc1, mlp.fc2, ls2.gamma}, norm. (mask_token is unused, parity with
    the reference which deletes it, dinov2.py:99.)
    """
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {}

    params["patch_embed"] = conv2d(
        sd["patch_embed.proj.weight"], sd.get("patch_embed.proj.bias")
    )
    params["cls_token"] = sd["cls_token"]
    params["pos_embed"] = sd["pos_embed"]
    if "register_tokens" in sd:
        params["register_tokens"] = sd["register_tokens"]

    n_blocks = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        p = f"blocks.{i}."
        block = {
            "norm1": layer_norm(sd[p + "norm1.weight"], sd[p + "norm1.bias"]),
            "norm2": layer_norm(sd[p + "norm2.weight"], sd[p + "norm2.bias"]),
            "attn": {
                "qkv": linear(sd[p + "attn.qkv.weight"], sd.get(p + "attn.qkv.bias")),
                "proj": linear(sd[p + "attn.proj.weight"], sd.get(p + "attn.proj.bias")),
            },
            "mlp": {
                "fc1": linear(sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]),
                "fc2": linear(sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"]),
            },
        }
        if p + "ls1.gamma" in sd:
            block["ls1"] = {"gamma": sd[p + "ls1.gamma"]}
            block["ls2"] = {"gamma": sd[p + "ls2.gamma"]}
        params[f"block_{i}"] = block

    params["norm"] = layer_norm(sd["norm.weight"], sd["norm.bias"])
    return params


def _convert_vit_block(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """One DINOv2/VGGT-style Block: norm1/attn(qkv,proj[,q_norm,k_norm])/
    ls1/norm2/mlp/ls2 -> our SelfAttentionBlock tree."""
    block = {
        "norm1": layer_norm(sd[p + "norm1.weight"], sd[p + "norm1.bias"]),
        "norm2": layer_norm(sd[p + "norm2.weight"], sd[p + "norm2.bias"]),
        "attn": {
            "qkv": linear(sd[p + "attn.qkv.weight"], sd.get(p + "attn.qkv.bias")),
            "proj": linear(
                sd[p + "attn.proj.weight"], sd.get(p + "attn.proj.bias")
            ),
        },
        "mlp": {
            "fc1": linear(sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]),
            "fc2": linear(sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"]),
        },
    }
    if p + "attn.q_norm.weight" in sd:
        block["attn"]["q_norm"] = layer_norm(
            sd[p + "attn.q_norm.weight"], sd[p + "attn.q_norm.bias"]
        )
        block["attn"]["k_norm"] = layer_norm(
            sd[p + "attn.k_norm.weight"], sd[p + "attn.k_norm.bias"]
        )
    if p + "ls1.gamma" in sd:
        block["ls1"] = {"gamma": sd[p + "ls1.gamma"]}
        block["ls2"] = {"gamma": sd[p + "ls2.gamma"]}
    return block


def convert_vggt(state: Mapping[str, np.ndarray]) -> Dict:
    """facebook/VGGT-1B state dict -> our ``models/external/vggt.VGGT``
    aggregator + camera-head param tree.

    Upstream names (vendored reference ``external/vggt/models/aggregator.py``
    and ``heads/camera_head.py``):

    - ``aggregator.patch_embed.*``  : a full DINOv2 ViT -> convert via
      :func:`convert_dinov2_vit` on the stripped sub-dict;
    - ``aggregator.camera_token`` (1, 2, 1, C) / ``register_token``
      (1, 2, 4, C) -> our (2, n, C) parameters;
    - ``aggregator.frame_blocks.N.*`` / ``global_blocks.N.*`` -> our
      ``frame_block_N`` / ``global_block_N`` (qk-norm blocks);
    - ``camera_head.{token_norm, trunk.N, trunk_norm, empty_pose_tokens,
      embed_pose, poseLN_modulation.1, pose_branch.fc1/fc2}``.

    The depth DPT head uses a structurally different decomposition in this
    framework (DPTFeature/DPTRegressionProcessor vs upstream's fused
    DPTHead); converting it needs the released weights to validate and is
    intentionally not attempted here — ``verify_tree_shapes`` will list it
    as missing so partial loads are explicit.
    """
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {"aggregator": {}, "camera_head": {}}
    agg = params["aggregator"]

    patch_sub = {
        k[len("aggregator.patch_embed."):]: v
        for k, v in sd.items()
        if k.startswith("aggregator.patch_embed.")
    }
    if patch_sub:
        if "patch_embed.proj.weight" in patch_sub:  # full ViT backbone
            agg["patch_embed"] = convert_dinov2_vit(patch_sub)
        else:  # plain conv ("conv" patch embed option)
            agg["patch_embed"] = conv2d(
                patch_sub["proj.weight"], patch_sub.get("proj.bias")
            )

    agg["camera_token"] = sd["aggregator.camera_token"][0]
    agg["register_token"] = sd["aggregator.register_token"][0]

    for kind in ("frame", "global"):
        n = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(rf"aggregator\.{kind}_blocks\.(\d+)\.", k))
        )
        for i in range(n):
            agg[f"{kind}_block_{i}"] = _convert_vit_block(
                sd, f"aggregator.{kind}_blocks.{i}."
            )

    cam = params["camera_head"]
    cam["token_norm"] = layer_norm(
        sd["camera_head.token_norm.weight"], sd["camera_head.token_norm.bias"]
    )
    cam["trunk_norm"] = layer_norm(
        sd["camera_head.trunk_norm.weight"], sd["camera_head.trunk_norm.bias"]
    )
    cam["empty_pose_tokens"] = sd["camera_head.empty_pose_tokens"]
    cam["embed_pose"] = linear(
        sd["camera_head.embed_pose.weight"], sd["camera_head.embed_pose.bias"]
    )
    # poseLN_modulation is Sequential(SiLU, Linear) -> index 1
    cam["poseLN_modulation"] = linear(
        sd["camera_head.poseLN_modulation.1.weight"],
        sd["camera_head.poseLN_modulation.1.bias"],
    )
    n_trunk = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(r"camera_head\.trunk\.(\d+)\.", k))
    )
    for i in range(n_trunk):
        cam[f"trunk_{i}"] = _convert_vit_block(sd, f"camera_head.trunk.{i}.")
    cam["pose_branch"] = {
        "fc1": linear(
            sd["camera_head.pose_branch.fc1.weight"],
            sd["camera_head.pose_branch.fc1.bias"],
        ),
        "fc2": linear(
            sd["camera_head.pose_branch.fc2.weight"],
            sd["camera_head.pose_branch.fc2.bias"],
        ),
    }
    return params


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth/.pt checkpoint to a numpy state dict (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if hasattr(ckpt, "state_dict"):
        ckpt = ckpt.state_dict()
    return {k: v.detach().numpy() for k, v in ckpt.items()}


def verify_tree_shapes(converted: Dict, target: Dict, path: str = "") -> list:
    """Compare a converted tree against a target param tree; return mismatches."""
    problems = []
    for k, v in target.items():
        where = f"{path}/{k}" if path else k
        if k not in converted:
            problems.append(f"missing: {where}")
        elif isinstance(v, dict):
            problems.extend(verify_tree_shapes(converted[k], v, where))
        else:
            cshape = np.shape(converted[k])
            tshape = np.shape(v)
            if tuple(cshape) != tuple(tshape):
                problems.append(f"shape mismatch at {where}: {cshape} vs {tshape}")
    return problems
