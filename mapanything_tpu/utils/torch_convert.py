"""Torch checkpoint -> flax parameter-tree conversion.

Enables loading pretrained reference weights (DINOv2 ViT image encoder,
the MapAnything trunk/heads) into this framework. Conversion rules:

  - Linear: torch (out, in) weight -> flax (in, out) kernel;
  - Conv2d: torch (out, in, kh, kw) -> flax (kh, kw, in, out);
  - ConvTranspose2d: torch (in, out, kh, kw) -> flax (kh, kw, out, in)
    with transpose_kernel=True;
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
    # torch: (in, out, kh, kw) -> flax ConvTranspose(transpose_kernel=True):
    # (kh, kw, out, in). transpose_kernel=True is required for exact torch
    # semantics — the default flax layout applies the kernel spatially
    # flipped (verified against nn.ConvTranspose2d in
    # tests/test_reference_parity.py).
    out = {"kernel": _t(w).transpose(2, 3, 1, 0)}
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
        (
            int(m.group(1))
            for k in sd
            if (m := re.match(r"blocks\.(\d+)\.", k))
        ),
        default=-1,
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


# --------------------------------------------------------------------------
# Full MapAnything model (reference mapanything/models/mapanything/model.py)
# --------------------------------------------------------------------------


def _max_index(sd: Mapping, pattern: str) -> int:
    idx = [
        int(m.group(1)) for k in sd if (m := re.match(pattern, k)) is not None
    ]
    return max(idx) + 1 if idx else 0


def convert_dense_rep_encoder(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference DenseRepresentationEncoder (dense_rep_encoder.py:55) ->
    our ``DenseRepresentationEncoder`` tree.

    Torch layout: conv_in; encoder.0..n-2 = ResidualBlock(conv1, conv2
    [, shortcut]); encoder.n-1 = final 1x1 Conv ("proj" here); norm_layer;
    post_pe_norm.
    """
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    out: Dict = {"conv_in": conv2d(sd["conv_in.weight"], sd["conv_in.bias"])}
    n_seq = _max_index(sd, r"encoder\.(\d+)\.")
    # final Conv2d registers params directly under its index
    n_res = 0
    for i in range(n_seq):
        if f"encoder.{i}.conv1.weight" in sd:
            blk = {
                "conv1": conv2d(
                    sd[f"encoder.{i}.conv1.weight"], sd[f"encoder.{i}.conv1.bias"]
                ),
                "conv2": conv2d(
                    sd[f"encoder.{i}.conv2.weight"], sd[f"encoder.{i}.conv2.bias"]
                ),
            }
            if f"encoder.{i}.shortcut.weight" in sd:
                blk["shortcut"] = conv2d(
                    sd[f"encoder.{i}.shortcut.weight"],
                    sd[f"encoder.{i}.shortcut.bias"],
                )
            out[f"res_{n_res}"] = blk
            n_res += 1
        else:
            out["proj"] = conv2d(
                sd[f"encoder.{i}.weight"], sd[f"encoder.{i}.bias"]
            )
    if "norm_layer.weight" in sd:
        out["norm"] = layer_norm(sd["norm_layer.weight"], sd["norm_layer.bias"])
    if "post_pe_norm.weight" in sd:
        out["post_pe_norm"] = layer_norm(
            sd["post_pe_norm.weight"], sd["post_pe_norm.bias"]
        )
    return out


def convert_global_rep_encoder(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference GlobalRepresentationEncoder (global_rep_encoder.py:14) ->
    our tree (fc_0..fc_k, fc_out, norm).

    The torch module nests Sequentials (encoder.0.0.0 ...); linears are
    collected in registration order, which torch preserves in the state
    dict.
    """
    lin = [
        (k[: -len(".weight")], _t(v))
        for k, v in sd.items()
        if k.startswith(p + "encoder") and k.endswith(".weight")
    ]
    out: Dict = {}
    for i, (name, w) in enumerate(lin):
        b = _t(sd[name + ".bias"])
        key = "fc_out" if i == len(lin) - 1 else f"fc_{i}"
        out[key] = linear(w, b)
    if p + "norm_layer.weight" in sd:
        out["norm"] = layer_norm(
            _t(sd[p + "norm_layer.weight"]), _t(sd[p + "norm_layer.bias"])
        )
    return out


def convert_alternating_transformer(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference MultiViewAlternatingAttentionTransformer[IFR]
    (alternating_attention_transformer.py:22,411) -> our
    ``AlternatingAttentionTransformer`` tree. The view PE table is a
    deterministic sinusoid buffer (regenerated, not converted)."""
    sd = {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    out: Dict = {}
    if "proj_embed.weight" in sd:
        out["proj_embed"] = linear(
            _t(sd["proj_embed.weight"]), _t(sd.get("proj_embed.bias"))
        )
    n = _max_index(sd, r"self_attention_blocks\.(\d+)\.")
    sdt = {k: _t(v) for k, v in sd.items()}
    for i in range(n):
        out[f"block_{i}"] = _convert_vit_block(
            sdt, f"self_attention_blocks.{i}."
        )
    out["norm"] = layer_norm(_t(sd["norm.weight"]), _t(sd["norm.bias"]))
    return out


def convert_dpt_feature(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference DPTFeature (dpt.py:32; croco dpt_block scratch layout) ->
    our ``DPTFeature`` tree.

    Torch: input_process.i.0 = act_postprocess (Sequential: 1x1 proj
    [+ up/down conv]), input_process.i.1 = 3x3 layer_rn (bias-free);
    scratch.refinenetK.{resConfUnit1, resConfUnit2, out_conv}."""
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    out: Dict = {}
    resize = {0: "act_0_up4", 1: "act_1_up2", 3: "act_3_down2"}
    for i in range(4):
        proj = conv2d(
            sd[f"input_process.{i}.0.0.weight"],
            sd.get(f"input_process.{i}.0.0.bias"),
        )
        out[f"act_{i}_proj"] = proj
        if f"input_process.{i}.0.1.weight" in sd:
            w = sd[f"input_process.{i}.0.1.weight"]
            b = sd.get(f"input_process.{i}.0.1.bias")
            # ConvTranspose2d for up4/up2 (in,out,kh,kw); stride-2 Conv2d
            # for the down path (out,in,kh,kw)
            if i == 3:
                out[resize[i]] = conv2d(w, b)
            else:
                out[resize[i]] = conv_transpose2d(w, b)
        out[f"layer_{i}_rn"] = {
            "kernel": np.transpose(sd[f"input_process.{i}.1.weight"], (2, 3, 1, 0))
        }
    for k in range(1, 5):
        rp = f"scratch.refinenet{k}."
        blk: Dict = {
            "out_conv": conv2d(
                sd[rp + "out_conv.weight"], sd.get(rp + "out_conv.bias")
            )
        }
        for unit in ("resConfUnit1", "resConfUnit2"):
            if rp + unit + ".conv1.weight" not in sd:
                continue
            name = "res_conf_unit1" if unit.endswith("1") else "res_conf_unit2"
            blk[name] = {
                "conv1": conv2d(
                    sd[rp + unit + ".conv1.weight"],
                    sd.get(rp + unit + ".conv1.bias"),
                ),
                "conv2": conv2d(
                    sd[rp + unit + ".conv2.weight"],
                    sd.get(rp + unit + ".conv2.bias"),
                ),
            }
        out[f"refinenet{k}"] = blk
    return out


def convert_dpt_regressor(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference DPTRegressionProcessor (dpt.py:238) -> conv1/conv2_0/conv2_1."""
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    return {
        "conv1": conv2d(sd["conv1.weight"], sd["conv1.bias"]),
        "conv2_0": conv2d(sd["conv2.0.weight"], sd["conv2.0.bias"]),
        "conv2_1": conv2d(sd["conv2.2.weight"], sd["conv2.2.bias"]),
    }


def convert_pose_head(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference PoseHead (pose_head.py:50) -> our ``PoseHead`` tree."""
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    out: Dict = {"proj": conv2d(sd["proj.weight"], sd["proj.bias"])}
    n = _max_index(sd, r"res_conv\.(\d+)\.")
    for i in range(n):
        out[f"res_conv_{i}"] = {
            f"res_conv{j}": conv2d(
                sd[f"res_conv.{i}.res_conv{j}.weight"],
                sd[f"res_conv.{i}.res_conv{j}.bias"],
            )
            for j in (1, 2, 3)
        }
    out["mlp_0"] = linear(sd["more_mlps.0.weight"], sd["more_mlps.0.bias"])
    out["mlp_1"] = linear(sd["more_mlps.2.weight"], sd["more_mlps.2.bias"])
    out["fc_t"] = linear(sd["fc_t.weight"], sd["fc_t.bias"])
    out["fc_rot"] = linear(sd["fc_rot.weight"], sd["fc_rot.bias"])
    return out


def convert_mlp_head(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """Reference MLPHead (mlp_head.py:13) -> our ``MLPHead`` tree."""
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    out: Dict = {"proj": linear(sd["proj.weight"], sd["proj.bias"])}
    n = _max_index(sd, r"mlp\.(\d+)\.")
    for i in range(n):
        out[f"mlp_{i}"] = linear(
            sd[f"mlp.{i}.0.weight"], sd[f"mlp.{i}.0.bias"]
        )
    out["output_proj"] = linear(
        sd["output_proj.weight"], sd["output_proj.bias"]
    )
    return out


def convert_mapanything(state: Mapping[str, np.ndarray]) -> Dict:
    """Full reference MapAnything state dict -> our model's param tree.

    Expects the reference's top-level module names (model.py:96-231):
    encoder.model.* (DINOv2), ray_dirs_encoder / depth_encoder (dense rep),
    depth_scale_encoder / cam_rot_encoder / cam_trans_encoder /
    cam_trans_scale_encoder (global rep), fusion_norm_layer, scale_token,
    info_sharing.*, dpt_feature_head / dpt_regressor_head (also reachable
    as dense_head.0/.1), pose_head, scale_head. Adaptors are
    parameter-free. Accepts "module."-prefixed (DDP) checkpoints.
    """
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }
    params: Dict = {
        "scale_token": _t(sd["scale_token"]),
        "fusion_norm": layer_norm(
            _t(sd["fusion_norm_layer.weight"]), _t(sd["fusion_norm_layer.bias"])
        ),
    }
    enc_sd = {
        k[len("encoder.model."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.model.")
    }
    params["encoder"] = convert_dinov2_vit(enc_sd)

    for name in ("ray_dirs_encoder", "depth_encoder"):
        params[name] = convert_dense_rep_encoder(sd, name + ".")
    for name in (
        "depth_scale_encoder",
        "cam_rot_encoder",
        "cam_trans_encoder",
        "cam_trans_scale_encoder",
    ):
        params[name] = convert_global_rep_encoder(sd, name + ".")

    params["info_sharing"] = convert_alternating_transformer(
        sd, "info_sharing."
    )

    dpt_prefix = (
        "dpt_feature_head."
        if any(k.startswith("dpt_feature_head.") for k in sd)
        else "dense_head.0."
    )
    reg_prefix = (
        "dpt_regressor_head."
        if any(k.startswith("dpt_regressor_head.") for k in sd)
        else "dense_head.1."
    )
    params["dpt_feature_head"] = convert_dpt_feature(sd, dpt_prefix)
    params["dpt_regressor_head"] = convert_dpt_regressor(sd, reg_prefix)
    params["pose_head"] = convert_pose_head(sd, "pose_head.")
    params["scale_head"] = convert_mlp_head(sd, "scale_head.")
    return params


def convert_moge(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference MoGe v1 state dict (external/moge/models/v1.py:261) ->
    our ``MoGeModel`` param tree.

    Torch layout: backbone.* (DINOv2); head.projects.i (1x1 convs);
    head.upsample_blocks.i.0.{0,1} (ConvTranspose 2x2 + replicate-pad
    conv), head.upsample_blocks.i.1.layers.{0,2,3,5} (ResidualConvBlock:
    GN, conv, GN, conv); head.output_block.j.{0,2} (conv3x3, conv1x1).
    """
    sd = {k: v for k, v in state.items()}
    params: Dict = {}
    bb = {
        k[len("backbone."):]: v for k, v in sd.items()
        if k.startswith("backbone.")
    }
    params["backbone"] = convert_dinov2_vit(bb)

    head: Dict = {}
    n_proj = _max_index(sd, r"head\.projects\.(\d+)\.")
    for i in range(n_proj):
        head[f"project_{i}"] = conv2d(
            _t(sd[f"head.projects.{i}.weight"]),
            _t(sd[f"head.projects.{i}.bias"]),
        )
    n_up = _max_index(sd, r"head\.upsample_blocks\.(\d+)\.")
    for i in range(n_up):
        p = f"head.upsample_blocks.{i}."
        head[f"upsample_{i}"] = conv_transpose2d(
            _t(sd[p + "0.0.weight"]), _t(sd[p + "0.0.bias"])
        )
        head[f"up_conv_{i}"] = conv2d(
            _t(sd[p + "0.1.weight"]), _t(sd[p + "0.1.bias"])
        )
        head[f"up_res_{i}"] = {
            "gn1": {"scale": _t(sd[p + "1.layers.0.weight"]),
                    "bias": _t(sd[p + "1.layers.0.bias"])},
            "conv1": conv2d(
                _t(sd[p + "1.layers.2.weight"]), _t(sd[p + "1.layers.2.bias"])
            ),
            "gn2": {"scale": _t(sd[p + "1.layers.3.weight"]),
                    "bias": _t(sd[p + "1.layers.3.bias"])},
            "conv2": conv2d(
                _t(sd[p + "1.layers.5.weight"]), _t(sd[p + "1.layers.5.bias"])
            ),
        }
    n_out = _max_index(sd, r"head\.output_block\.(\d+)\.")
    for j in range(n_out):
        p = f"head.output_block.{j}."
        head[f"out_conv_{j}"] = conv2d(
            _t(sd[p + "0.weight"]), _t(sd[p + "0.bias"])
        )
        head[f"out_proj_{j}"] = conv2d(
            _t(sd[p + "2.weight"]), _t(sd[p + "2.bias"])
        )
    params["head"] = head
    return params


def convert_pi3(state: Mapping[str, np.ndarray]) -> Dict:
    """Upstream Pi3 state dict (vendored reference
    ``mapanything/models/external/pi3/models/pi3.py:26``) -> our
    ``models/external/pi3.Pi3`` param tree.

    Upstream names: encoder.* (DINOv2 ViT-L/14 with 4 registers,
    mask_token deleted); decoder.N.* (BlockRope: fused qkv + head-dim
    qk-norm + LayerScale); register_token (1, 1, 5, C);
    {point,conf,camera}_decoder.{projects, blocks.N, linear_out}
    (transformer_head.py:12); {point,conf}_head.proj (LinearPts3d ->
    our LinearFeature 1x1 conv); camera_head.{res_conv.N.res_convK,
    more_mlps.0/2, fc_t, fc_rot} (camera_head.py:40).
    """
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {}

    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    params["encoder"] = convert_dinov2_vit(enc)

    n_dec = _max_index(sd, r"decoder\.(\d+)\.")
    for i in range(n_dec):
        params[f"decoder_{i}"] = _convert_vit_block(sd, f"decoder.{i}.")

    params["register_token"] = sd["register_token"][0]  # (1,1,5,C) -> (1,5,C)

    def head_decoder(prefix):
        out = {"project": linear(sd[prefix + "projects.weight"],
                                 sd[prefix + "projects.bias"])}
        n = _max_index(sd, re.escape(prefix) + r"blocks\.(\d+)\.")
        for i in range(n):
            out[f"block_{i}"] = _convert_vit_block(sd, f"{prefix}blocks.{i}.")
        out["linear_out"] = linear(sd[prefix + "linear_out.weight"],
                                   sd[prefix + "linear_out.bias"])
        return out

    params["point_decoder"] = head_decoder("point_decoder.")
    params["conf_decoder"] = head_decoder("conf_decoder.")
    params["camera_decoder"] = head_decoder("camera_decoder.")

    def linear_feature(prefix):
        # nn.Linear (out, in) -> our LinearFeature's 1x1 conv (1, 1, in, out)
        w = _t(sd[prefix + "proj.weight"]).T[None, None]
        return {"linear": {"kernel": w, "bias": _t(sd[prefix + "proj.bias"])}}

    params["point_head"] = linear_feature("point_head.")
    params["conf_head"] = linear_feature("conf_head.")

    cam: Dict = {}
    for i in range(_max_index(sd, r"camera_head\.res_conv\.(\d+)\.")):
        for j in (1, 2, 3):
            cam[f"res{i}_{j}"] = linear(
                sd[f"camera_head.res_conv.{i}.res_conv{j}.weight"],
                sd[f"camera_head.res_conv.{i}.res_conv{j}.bias"],
            )
    cam["mlp1"] = linear(sd["camera_head.more_mlps.0.weight"],
                         sd["camera_head.more_mlps.0.bias"])
    cam["mlp2"] = linear(sd["camera_head.more_mlps.2.weight"],
                         sd["camera_head.more_mlps.2.bias"])
    cam["fc_t"] = linear(sd["camera_head.fc_t.weight"],
                         sd["camera_head.fc_t.bias"])
    cam["fc_rot"] = linear(sd["camera_head.fc_rot.weight"],
                           sd["camera_head.fc_rot.bias"])
    params["camera_head"] = cam
    return params


# --------------------------------------------------------------------------
# DUSt3R family (ModularDUSt3R / MASt3R / MUSt3R / Pow3R)
# --------------------------------------------------------------------------


def convert_croco_encoder(sd: Mapping[str, np.ndarray], p: str = "") -> Dict:
    """CroCo/DUSt3R image encoder (patch_embed.proj, enc_blocks.N, enc_norm)
    -> our ``CroCoEncoder`` tree (patch_embed, block_N, norm).

    Upstream naming per the public DUSt3R/CroCoV2 release (the reference
    wraps it via pip, models/external/mast3r/__init__.py)."""
    sd = {k[len(p):]: _t(v) for k, v in sd.items() if k.startswith(p)}
    out: Dict = {
        "patch_embed": conv2d(
            sd["patch_embed.proj.weight"], sd.get("patch_embed.proj.bias")
        )
    }
    n = _max_index(sd, r"enc_blocks\.(\d+)\.")
    for i in range(n):
        out[f"block_{i}"] = _convert_vit_block(sd, f"enc_blocks.{i}.")
    out["norm"] = layer_norm(sd["enc_norm.weight"], sd["enc_norm.bias"])
    return out


def _convert_decoder_block(sd: Mapping[str, np.ndarray], p: str) -> Dict:
    """CroCo DecoderBlock (norm1/attn, norm2/cross_attn projq|k|v,
    norm3/mlp, optional norm_y) -> our ``CrossAttentionBlock`` tree."""
    blk: Dict = {
        "norm1": layer_norm(sd[p + "norm1.weight"], sd[p + "norm1.bias"]),
        "attn": {
            "qkv": linear(sd[p + "attn.qkv.weight"], sd.get(p + "attn.qkv.bias")),
            "proj": linear(
                sd[p + "attn.proj.weight"], sd.get(p + "attn.proj.bias")
            ),
        },
        "norm2": layer_norm(sd[p + "norm2.weight"], sd[p + "norm2.bias"]),
        "cross_attn": {
            "projq": linear(
                sd[p + "cross_attn.projq.weight"],
                sd.get(p + "cross_attn.projq.bias"),
            ),
            "projk": linear(
                sd[p + "cross_attn.projk.weight"],
                sd.get(p + "cross_attn.projk.bias"),
            ),
            "projv": linear(
                sd[p + "cross_attn.projv.weight"],
                sd.get(p + "cross_attn.projv.bias"),
            ),
            "proj": linear(
                sd[p + "cross_attn.proj.weight"],
                sd.get(p + "cross_attn.proj.bias"),
            ),
        },
        "norm3": layer_norm(sd[p + "norm3.weight"], sd[p + "norm3.bias"]),
        "mlp": {
            "fc1": linear(sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]),
            "fc2": linear(sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"]),
        },
    }
    if p + "norm_y.weight" in sd:
        blk["norm_mem"] = layer_norm(
            sd[p + "norm_y.weight"], sd[p + "norm_y.bias"]
        )
    return blk


def convert_modular_dust3r(state: Mapping[str, np.ndarray]) -> Dict:
    """DUSt3R-style checkpoint -> our ``ModularDUSt3R`` tree.

    Maps: patch_embed/enc_blocks/enc_norm -> encoder; decoder_embed ->
    decoder/proj_embed; dec_blocks.N -> decoder/ref_block_N; dec_blocks2.N
    (asymmetric ckpts) or shared dec_blocks -> decoder/nonref_block_N;
    dec_norm -> decoder/norm. The upstream DPT heads (downstream_head1/2)
    use DUSt3R's fused DPTOutputAdapter layout, which decomposes
    differently from our DPTFeature/DPTRegressionProcessor — converting
    them requires released weights to validate, so they are intentionally
    left unconverted (verify_tree_shapes reports them as missing; same
    policy as convert_vggt's depth head)."""
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): _t(v)
        for k, v in state.items()
    }
    params: Dict = {"encoder": convert_croco_encoder(sd)}
    dec: Dict = {}
    if "decoder_embed.weight" in sd:
        dec["proj_embed"] = linear(
            sd["decoder_embed.weight"], sd.get("decoder_embed.bias")
        )
    n = _max_index(sd, r"dec_blocks\.(\d+)\.")
    for i in range(n):
        dec[f"ref_block_{i}"] = _convert_decoder_block(sd, f"dec_blocks.{i}.")
        p2 = f"dec_blocks2.{i}." if f"dec_blocks2.{i}.norm1.weight" in sd else f"dec_blocks.{i}."
        dec[f"nonref_block_{i}"] = _convert_decoder_block(sd, p2)
    dec["norm"] = layer_norm(sd["dec_norm.weight"], sd["dec_norm.bias"])
    params["decoder"] = dec
    return params


def convert_mast3r(state: Mapping[str, np.ndarray]) -> Dict:
    """MASt3R checkpoint -> our ``MASt3RModel`` tree: the ModularDUSt3R
    trunk plus the local-feature descriptor MLP
    (downstream_head1.head_local_features: an Mlp fc1/fc2 whose pixel-
    shuffled output is desc(24) + desc_conf, upstream
    mast3r/catmlp_dpt_head.py)."""
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {"trunk": convert_modular_dust3r(sd)}
    p = "downstream_head1.head_local_features."
    if p + "fc1.weight" in sd:
        params["desc_mlp1"] = linear(sd[p + "fc1.weight"], sd[p + "fc1.bias"])
        # fc2 emits (desc_dim+1) * patch**2 channels -> our LinearFeature
        params["desc_head"] = {
            "linear": {
                "kernel": _t(sd[p + "fc2.weight"]).T[None, None],
                "bias": _t(sd[p + "fc2.bias"]),
            }
        }
    return params


def convert_must3r(state: Mapping[str, np.ndarray]) -> Dict:
    """MUSt3R checkpoint -> our ``MUSt3RModel`` tree (croco encoder +
    decoder_embed + multi-view memory decoder + linear head; upstream
    naive-ville/must3r follows the DUSt3R naming above)."""
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {"encoder": convert_croco_encoder(sd)}
    params["decoder_embed"] = linear(
        sd["decoder_embed.weight"], sd.get("decoder_embed.bias")
    )
    dec: Dict = {}
    n = _max_index(sd, r"dec_blocks\.(\d+)\.")
    for i in range(n):
        dec[f"block_{i}"] = _convert_decoder_block(sd, f"dec_blocks.{i}.")
    dec["dec_norm"] = layer_norm(sd["dec_norm.weight"], sd["dec_norm.bias"])
    params["decoder"] = dec
    if "downstream_head.proj.weight" in sd:
        params["head"] = {
            "linear": {
                "kernel": _t(sd["downstream_head.proj.weight"]).T[None, None],
                "bias": _t(sd["downstream_head.proj.bias"]),
            }
        }
    return params


def convert_pow3r(state: Mapping[str, np.ndarray]) -> Dict:
    """Pow3R checkpoint -> our ``Pow3RModel`` tree (dust3r-style trunk +
    side-channel embedders; upstream naver/pow3r follows the DUSt3R
    naming, with `pose_embed` MLPs for the camera side channels)."""
    sd = {k: _t(v) for k, v in state.items()}
    params: Dict = {}
    params["patch_embed"] = conv2d(
        sd["patch_embed.proj.weight"], sd.get("patch_embed.proj.bias")
    )
    if "patch_ln.weight" in sd:
        params["patch_ln"] = layer_norm(sd["patch_ln.weight"], sd["patch_ln.bias"])
    for i in range(_max_index(sd, r"enc_blocks\.(\d+)\.")):
        params[f"enc_block_{i}"] = _convert_vit_block(sd, f"enc_blocks.{i}.")
    params["enc_norm"] = layer_norm(sd["enc_norm.weight"], sd["enc_norm.bias"])
    params["decoder_embed"] = linear(
        sd["decoder_embed.weight"], sd.get("decoder_embed.bias")
    )
    for branch, pref in ((1, "dec_blocks."), (2, "dec_blocks2.")):
        n = _max_index(sd, re.escape(pref[:-1]) + r"\.(\d+)\.")
        for i in range(n):
            params[f"dec{branch}_block_{i}"] = _convert_decoder_block(sd, f"{pref}{i}.")
    for branch in (1, 2):
        key = f"dec_norm{branch}"
        src = "dec_norm" if "dec_norm.weight" in sd else f"dec_norm{branch}"
        if src + ".weight" in sd:
            params[key] = layer_norm(sd[src + ".weight"], sd[src + ".bias"])
    if "pose_embed.0.weight" in sd:
        params["pose_embed_hidden"] = linear(
            sd["pose_embed.0.weight"], sd["pose_embed.0.bias"]
        )
        params["pose_embed_out"] = linear(
            sd["pose_embed.2.weight"], sd["pose_embed.2.bias"]
        )
    return params


def convert_radio_encoder(state: Mapping[str, np.ndarray]) -> Dict:
    """NVIDIA RADIO torch-hub checkpoint -> our ``RADIOEncoder`` backbone
    tree. RADIO's trunk is a timm/DINOv2-style ViT under ``model.*``
    (radio_model.model.blocks.N...) — route through convert_dinov2_vit."""
    sd = {k: _t(v) for k, v in state.items()}
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    vit = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return {"backbone": convert_dinov2_vit(vit)}


def convert_cosmos_encoder(state: Mapping[str, np.ndarray]) -> Dict:
    """Cosmos continuous-image tokenizer encoder checkpoint -> our
    ``CosmosEncoder`` tree.

    Upstream naming (the reference's vendored
    uniception/models/libs/cosmos_tokenizer/modules/layers2d.py:139 +
    networks/continuous_image.py:39): encoder.conv_in,
    encoder.down.{L}.block.{j}.{norm1,conv1,norm2,conv2,nin_shortcut},
    encoder.down.{L}.downsample.conv, encoder.mid.{block_1,attn_1,block_2},
    encoder.norm_out, encoder.conv_out, quant_conv. Accepts dicts with or
    without the "encoder." prefix.
    """
    sd = {k: _t(v) for k, v in state.items()}
    if any(k.startswith("encoder.") for k in sd):
        enc = {k[len("encoder."):]: v for k, v in sd.items()
               if k.startswith("encoder.")}
    else:
        enc = dict(sd)

    def group_norm(p):
        return {"scale": _t(enc[p + ".weight"]), "bias": _t(enc[p + ".bias"])}

    def resblock(p):
        out = {
            "GroupNorm_0": group_norm(p + ".norm1"),
            "Conv_0": conv2d(enc[p + ".conv1.weight"], enc[p + ".conv1.bias"]),
            "GroupNorm_1": group_norm(p + ".norm2"),
            "Conv_1": conv2d(enc[p + ".conv2.weight"], enc[p + ".conv2.bias"]),
        }
        if p + ".nin_shortcut.weight" in enc:
            out["Conv_2"] = conv2d(
                enc[p + ".nin_shortcut.weight"], enc[p + ".nin_shortcut.bias"]
            )
        return out

    params: Dict = {
        "conv_in": conv2d(enc["conv_in.weight"], enc["conv_in.bias"]),
    }
    n_levels = 1 + max(
        int(m.group(1)) for k in enc
        if (m := re.match(r"down\.(\d+)\.", k))
    )
    for lv in range(n_levels):
        n_blocks = 1 + max(
            int(m.group(1)) for k in enc
            if (m := re.match(rf"down\.{lv}\.block\.(\d+)\.", k))
        )
        for j in range(n_blocks):
            params[f"res_{lv}_{j}"] = resblock(f"down.{lv}.block.{j}")
        if f"down.{lv}.downsample.conv.weight" in enc:
            params[f"down_{lv}"] = conv2d(
                enc[f"down.{lv}.downsample.conv.weight"],
                enc[f"down.{lv}.downsample.conv.bias"],
            )
    params["mid_res1"] = resblock("mid.block_1")
    params["mid_res2"] = resblock("mid.block_2")
    params["mid_attn"] = {
        "GroupNorm_0": group_norm("mid.attn_1.norm"),
        "q": conv2d(enc["mid.attn_1.q.weight"], enc["mid.attn_1.q.bias"]),
        "k": conv2d(enc["mid.attn_1.k.weight"], enc["mid.attn_1.k.bias"]),
        "v": conv2d(enc["mid.attn_1.v.weight"], enc["mid.attn_1.v.bias"]),
        "proj_out": conv2d(
            enc["mid.attn_1.proj_out.weight"], enc["mid.attn_1.proj_out.bias"]
        ),
    }
    params["GroupNorm_0"] = group_norm("norm_out")
    params["conv_out"] = conv2d(enc["conv_out.weight"], enc["conv_out.bias"])
    qk = "quant_conv.weight" if "quant_conv.weight" in sd else None
    if qk:
        params["quant_conv"] = conv2d(sd["quant_conv.weight"],
                                      sd["quant_conv.bias"])
    return params


def convert_vgg19_features(state: Mapping[str, np.ndarray]) -> Dict:
    """torchvision ``vgg19`` state dict -> our ``VGG19Features`` tree.

    torchvision names the conv tower ``features.{i}.weight/bias`` with
    conv layers at indices 0,2,5,7,10,...,34 (VGG configuration "E");
    our flax module names each conv ``conv{i}`` by the same torchvision
    index (models/perceptual.py). Only the convs up to the last
    perceptual tap (features index 32) are needed. Accepts full
    torchvision dicts (classifier weights ignored) with or without the
    ``features.`` prefix. Parity: mapanything/train/losses.py:478-495.
    """
    from mapanything_tpu.models.perceptual import VGG19_CONV_INDICES

    sd = {k: _t(v) for k, v in state.items()}
    if any(k.startswith("features.") for k in sd):
        sd = {k[len("features."):]: v for k, v in sd.items()
              if k.startswith("features.")}
    params: Dict = {}
    for i in VGG19_CONV_INDICES:
        if f"{i}.weight" not in sd:
            break  # taps only need convs below index 32
        params[f"conv{i}"] = conv2d(sd[f"{i}.weight"], sd[f"{i}.bias"])
    return params


def convert_anycalib(state: Mapping[str, np.ndarray]) -> Dict:
    """Upstream ``anycalib`` checkpoint -> our ``AnyCalibNet`` tree.

    The upstream pip package (arXiv:2503.12701) is NOT vendored in the
    reference (``mapanything/models/external/anycalib/__init__.py``
    imports it from site-packages), so only its published structure can
    be targeted: a DINOv2 backbone (``backbone.*``, standard DINOv2
    naming -> routed through :func:`convert_dinov2_vit`, which IS
    numerically validated against the real reference DINOv2) plus a
    light conv decoder. Decoder tensors are mapped by shape onto our
    ``dec_in``/``up{i}``/``dec_out`` convs; a mismatch raises so silent
    garbage cannot load. Use ``verify_tree_shapes`` after conversion.
    """
    sd = {k: _t(v) for k, v in state.items()}
    bb_prefix = None
    for cand in ("backbone.", "model.backbone.", "net.backbone."):
        if any(k.startswith(cand) for k in sd):
            bb_prefix = cand
            break
    if bb_prefix is None:
        raise ValueError(
            "convert_anycalib: no 'backbone.*' keys found; got e.g. "
            + ", ".join(sorted(sd)[:5])
        )
    vit = {k[len(bb_prefix):]: v for k, v in sd.items()
           if k.startswith(bb_prefix)}
    params: Dict = {"backbone": convert_dinov2_vit(vit)}

    # Decoder: collect remaining conv/conv-transpose weights in checkpoint
    # order and map onto our decoder slots by kind.
    rest = {k: v for k, v in sd.items() if not k.startswith(bb_prefix)}
    convs = [(k, v) for k, v in rest.items()
             if k.endswith(".weight") and v.ndim == 4]
    ups, plains = [], []
    for k, v in convs:
        base = k[:-len(".weight")]
        pair = (v, rest.get(base + ".bias"))
        # transpose convs / upsamplers carry 'up' or 'deconv' in their name
        (ups if ("up" in base or "deconv" in base) else plains).append(pair)
    if len(plains) < 2:
        raise ValueError(
            "convert_anycalib: expected >=2 plain decoder convs, got "
            f"{len(plains)}"
        )
    params["dec_in"] = conv2d(*plains[0])
    for i, pair in enumerate(ups[:2]):
        params[f"up{i}"] = conv_transpose2d(*pair)
    params["dec_out"] = conv2d(*plains[-1])
    return params


# ---------------------------------------------------------------------------
# VGGSfM tracker (the learned coarse->fine track refiner)
# ---------------------------------------------------------------------------


def _mha(sd, p):
    """torch nn.MultiheadAttention -> models.external.vggsfm_tracker.TorchMHA."""
    return {
        "in_proj_kernel": _t(sd[p + ".in_proj_weight"]).T,
        "in_proj_bias": _t(sd[p + ".in_proj_bias"]),
        "out_proj": linear(sd[p + ".out_proj.weight"], sd[p + ".out_proj.bias"]),
    }


def _tracker_mlp(sd, p):
    return {
        "fc1": linear(sd[p + ".fc1.weight"], sd[p + ".fc1.bias"]),
        "fc2": linear(sd[p + ".fc2.weight"], sd[p + ".fc2.bias"]),
    }


def _attn_block(sd, p):
    # norm1/norm2 are non-affine (no parameters)
    return {"attn": _mha(sd, p + ".attn"), "mlp": _tracker_mlp(sd, p + ".mlp")}


def _cross_attn_block(sd, p):
    return {
        "cross_attn": _mha(sd, p + ".cross_attn"),
        "norm_context": layer_norm(
            sd[p + ".norm_context.weight"], sd[p + ".norm_context.bias"]
        ),
        "mlp": _tracker_mlp(sd, p + ".mlp"),
    }


def _tracker_res_block(sd, p):
    out = {
        "conv1": conv2d(sd[p + ".conv1.weight"], sd[p + ".conv1.bias"]),
        "conv2": conv2d(sd[p + ".conv2.weight"], sd[p + ".conv2.bias"]),
    }
    if p + ".downsample.0.weight" in sd:  # Sequential(conv1x1, norm)
        out["downsample"] = conv2d(
            sd[p + ".downsample.0.weight"], sd[p + ".downsample.0.bias"]
        )
    return out


def _updateformer(sd, p, time_depth, space_depth):
    out = {
        "input_transform": linear(
            sd[p + ".input_transform.weight"], sd[p + ".input_transform.bias"]
        ),
        "flow_head": linear(
            sd[p + ".flow_head.weight"], sd[p + ".flow_head.bias"]
        ),
    }
    if p + ".virual_tracks" in sd:  # (sic) upstream name
        out["virual_tracks"] = _t(sd[p + ".virual_tracks"])
    for i in range(time_depth):
        out[f"time_blocks_{i}"] = _attn_block(sd, f"{p}.time_blocks.{i}")
    for j in range(space_depth):
        out[f"space_virtual_blocks_{j}"] = _attn_block(
            sd, f"{p}.space_virtual_blocks.{j}"
        )
        out[f"space_point2virtual_blocks_{j}"] = _cross_attn_block(
            sd, f"{p}.space_point2virtual_blocks.{j}"
        )
        out[f"space_virtual2point_blocks_{j}"] = _cross_attn_block(
            sd, f"{p}.space_virtual2point_blocks.{j}"
        )
    return out


def _base_tracker_predictor(sd, p, depth, space, fine):
    out = {
        "updateformer": _updateformer(sd, f"{p}.updateformer", depth,
                                      depth if space else 0),
        # GroupNorm(1, latent): torch weight/bias -> flax scale/bias
        "norm": {"scale": _t(sd[p + ".norm.weight"]),
                 "bias": _t(sd[p + ".norm.bias"])},
        # ffeat_updater is Sequential(Linear, GELU) -> index 0
        "ffeat_updater": linear(
            sd[p + ".ffeat_updater.0.weight"], sd[p + ".ffeat_updater.0.bias"]
        ),
    }
    if not fine:
        out["vis_predictor"] = linear(
            sd[p + ".vis_predictor.0.weight"], sd[p + ".vis_predictor.0.bias"]
        )
    return out


def convert_vggsfm_tracker(state: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``TrackerPredictor`` state dict -> our
    ``models/external/vggsfm_tracker.VGGSfMTracker`` param tree.

    Parity map (``/root/reference/mapanything/third_party/vggsfm_tracker.py:18``):
    ``coarse_fnet`` (BasicEncoder: conv1 + 4x Sequential residual layers ->
    ``layer{i}_{0,1}`` + conv2/conv3), ``coarse_predictor`` / ``fine_predictor``
    (BaseTrackerPredictor: updateformer + GroupNorm + ffeat/vis heads;
    InstanceNorms and the non-affine LayerNorms carry no parameters), and
    ``fine_fnet`` (ShallowEncoder: single residual blocks per layer).
    Numerical parity vs the actually-imported reference modules:
    tests/test_tracker_parity.py.
    """
    sd = {k: _t(v) for k, v in state.items()}
    # tolerate a wrapping prefix (e.g. "tracker.")
    if not any(k.startswith("coarse_fnet.") for k in sd):
        for pref in ("tracker.", "model.", "module."):
            if any(k.startswith(pref + "coarse_fnet.") for k in sd):
                sd = {k[len(pref):]: v for k, v in sd.items()
                      if k.startswith(pref)}
                break
    params: Dict = {}

    cf = {"conv1": conv2d(sd["coarse_fnet.conv1.weight"],
                          sd["coarse_fnet.conv1.bias"])}
    for li in range(1, 5):
        for bi in range(2):
            cf[f"layer{li}_{bi}"] = _tracker_res_block(
                sd, f"coarse_fnet.layer{li}.{bi}"
            )
    cf["conv2"] = conv2d(sd["coarse_fnet.conv2.weight"],
                         sd["coarse_fnet.conv2.bias"])
    cf["conv3"] = conv2d(sd["coarse_fnet.conv3.weight"],
                         sd["coarse_fnet.conv3.bias"])
    params["coarse_fnet"] = cf

    ff = {
        "conv1": conv2d(sd["fine_fnet.conv1.weight"],
                        sd["fine_fnet.conv1.bias"]),
        "layer1": _tracker_res_block(sd, "fine_fnet.layer1"),
        "layer2": _tracker_res_block(sd, "fine_fnet.layer2"),
        "conv2": conv2d(sd["fine_fnet.conv2.weight"],
                        sd["fine_fnet.conv2.bias"]),
    }
    params["fine_fnet"] = ff

    params["coarse_predictor"] = _base_tracker_predictor(
        sd, "coarse_predictor", depth=6, space=True, fine=False
    )
    params["fine_predictor"] = _base_tracker_predictor(
        sd, "fine_predictor", depth=4, space=False, fine=True
    )
    return params
