#!/usr/bin/env python
"""Generate the full config tree (reference configs/ group coverage).

Run from the repo root; idempotent. Encodes the reference's Hydra group
structure (configs/dataset, machine, loss, train_params, distributed,
model) in this framework's schema. Dataset DSL strings target
mapanything_tpu.data.datasets.wai_datasets (scripts/train.py:build_dataset).
"""

from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "configs"

# (group_dir, class_name, covis_thres, val_resolution_key, train_repeat, val_repeat)
DATASETS = [
    ("ase_wai", "ASEWAI", 0.25, "518_1_00_ar", 420_000, 4_000),
    ("blendedmvs_wai", "BlendedMVSWAI", 0.25, "518_1_33_ar", 420_000, 4_000),
    ("dl3dv_wai", "DL3DVWAI", 0.25, "518_1_77_ar", 420_000, 4_000),
    ("dynamicreplica_wai", "DynamicReplicaWAI", 0.25, "518_1_77_ar", 320_000, 4_000),
    ("megadepth_wai", "MegaDepthWAI", 0.25, "518_1_52_ar", 420_000, 4_000),
    ("mpsd_wai", "MPSDWAI", 0.25, "518_1_77_ar", 420_000, 4_000),
    ("mvs_synth_wai", "MVSSynthWAI", 0.25, "518_1_77_ar", 420_000, 4_000),
    ("paralleldomain4d_wai", "ParallelDomain4DWAI", 0.25, "518_1_33_ar", 420_000, 4_000),
    ("sailvos3d_wai", "SAILVOS3DWAI", 0.25, "518_1_52_ar", 420_000, 4_000),
    ("scannetpp_wai", "ScanNetPPWAI", 0.25, "518_1_52_ar", 420_000, 4_000),
    ("spring_wai", "SpringWAI", 0.25, "518_1_77_ar", 16_000, 500),
    ("tav2_wb_wai", "TartanAirV2WBWAI", 0.25, "518_1_00_ar", 420_000, 4_000),
    ("unrealstereo4k_wai", "UnrealStereo4KWAI", 0.25, "518_1_77_ar", 44_000, 500),
    # extra groups this framework also supports
    ("eth3d_wai", "ETH3DWAI", 0.025, "518_1_52_ar", 0, 0),
    ("co3d_wai", "CO3DWAI", 0.25, "518_1_00_ar", 0, 0),
]
MEGA_13 = [d for d in DATASETS if d[4] > 0]
MEGA_6 = [d for d in DATASETS if d[0] in (
    "ase_wai", "blendedmvs_wai", "megadepth_wai", "mpsd_wai",
    "scannetpp_wai", "tav2_wb_wai")]

ROOTDIR_KEY = {
    "ase_wai": "ase", "blendedmvs_wai": "blendedmvs", "dl3dv_wai": "dl3dv",
    "dynamicreplica_wai": "dynamicreplica", "megadepth_wai": "megadepth",
    "mpsd_wai": "mpsd", "mvs_synth_wai": "mvs_synth",
    "paralleldomain4d_wai": "paralleldomain4d", "sailvos3d_wai": "sailvos3d",
    "scannetpp_wai": "scannetppv2", "spring_wai": "spring",
    "tav2_wb_wai": "tav2_wb", "unrealstereo4k_wai": "unrealstereo4k",
    "eth3d_wai": "eth3d", "co3d_wai": "co3d",
}


def w(path: str, content: str):
    p = ROOT / path
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content.lstrip("\n"))


def res_options():
    out = []
    for base, pairs in {
        518: [(518, 518), (518, 392), (518, 336), (518, 294), (518, 252),
              (518, 168), (392, 518), (336, 518), (294, 518), (252, 518)],
        512: [(512, 512), (512, 384), (512, 336), (512, 288), (512, 256),
              (512, 160), (384, 512), (336, 512), (288, 512), (256, 512)],
        224: [(224, 224), (224, 168), (224, 140), (168, 224), (140, 224)],
    }.items():
        out.append(f"{base}_many_ar: '{pairs}'")
        landscape = [p for p in pairs if p[0] >= p[1]]
        out.append(f"{base}_many_landscape_ar: '{landscape}'")
        names = {
            "0_50_ar": -1, "1_00_ar": 0,
        }
        # named single-AR entries (reference resolution_options/default.yaml)
        ar_names = ["1_00_ar", "1_33_ar", "1_52_ar", "1_77_ar", "2_00_ar",
                    "3_20_ar", "0_75_ar", "0_66_ar", "0_56_ar", "0_50_ar"]
        if base in (518, 512):
            for name, pair in zip(ar_names, pairs[:6] + pairs[6:]):
                out.append(f"{base}_{name}: '{pair}'")
    return "# Aspect-ratio bucket sets (reference utils/image.py:40-70)\n" + "\n".join(out) + "\n"


w("dataset/resolution_options/default.yaml", res_options())

# --- per-dataset groups ----------------------------------------------------
for group, cls, covis, val_res, _, _ in DATASETS:
    short = group[:-4] if group.endswith("_wai") else group
    w(f"{group}/default.yaml".replace(group, f"dataset/{group}"), f"""
defaults:
  - train: default
  - val: default
""")
    train_str = (
        f"{cls}(split='train', "
        f"resolution=${{dataset.{group}.train.dataset_resolution}}, "
        f"principal_point_centered=${{dataset.{group}.train.principal_point_centered}}, "
        f"aug_crop=${{dataset.{group}.train.aug_crop}}, "
        f"transform='${{dataset.{group}.train.transform}}', "
        f"data_norm_type='${{dataset.{group}.train.data_norm_type}}', "
        f"ROOT='${{dataset.{group}.train.ROOT}}', "
        f"dataset_metadata_dir='${{dataset.{group}.train.dataset_metadata_dir}}', "
        f"variable_num_views=${{dataset.{group}.train.variable_num_views}}, "
        f"num_views=${{dataset.{group}.train.num_views}}, "
        f"covisibility_thres=${{dataset.{group}.train.covisibility_thres}})"
    )
    w(f"dataset/{group}/train/default.yaml", f"""
dataset_str: "{train_str}"
dataset_resolution: ${{dataset.resolution_train}}
principal_point_centered: ${{dataset.principal_point_centered}}
aug_crop: 16
transform: colorjitter+grayscale+gaublur
data_norm_type: ${{model.data_norm_type}}
ROOT: ${{root_data_dir}}/{ROOTDIR_KEY[group]}
dataset_metadata_dir: ${{mapanything_dataset_metadata_dir}}
variable_num_views: ${{dataset.train.variable_num_views}}
num_views: ${{dataset.num_views}}
covisibility_thres: {covis}
""")
    val_str = train_str.replace(".train.", ".val.").replace(
        "split='train'", "split='val'").replace(
        f"aug_crop=${{dataset.{group}.val.aug_crop}}, ", "").replace(
        f"variable_num_views=", f"seed=${{dataset.{group}.val.seed}}, variable_num_views=")
    w(f"dataset/{group}/val/default.yaml", f"""
dataset_str: "{val_str}"
dataset_resolution: ${{dataset.resolution_val_{short}}}
principal_point_centered: ${{dataset.principal_point_centered}}
seed: 777
transform: imgnorm
data_norm_type: ${{model.data_norm_type}}
ROOT: ${{root_data_dir}}/{ROOTDIR_KEY[group]}
dataset_metadata_dir: ${{mapanything_dataset_metadata_dir}}
variable_num_views: ${{dataset.val.variable_num_views}}
num_views: ${{dataset.num_views}}
covisibility_thres: {covis}
""")

# --- dataset/default.yaml ---------------------------------------------------
group_defaults = "\n".join(f"  - {g}: default" for g, *_ in DATASETS)
val_res_defaults = "\n".join(
    f"resolution_val_{g[:-4]}: ${{dataset.resolution_options.{vr}}}"
    for g, _, _, vr, _, _ in DATASETS
)
w("dataset/default.yaml", f"""
defaults:
  - resolution_options: default
{group_defaults}

# Training set DSL (evaluated by scripts/train.py:build_dataset)
train_dataset: ???
# Validation set DSL
test_dataset: "[null]"
num_workers: 12
resolution_train: ???
{val_res_defaults}
num_views: 2
principal_point_centered: false
train:
  variable_num_views: true
val:
  variable_num_views: false
test:
  variable_num_views: false
""")


def megatrain(name, datasets, num_views, res_key, note):
    train = "\n  ".join(
        f"+ {tr:_} @ ${{dataset.{g}.train.dataset_str}}"
        for g, _, _, _, tr, _ in datasets
    ).lstrip("+ ")
    test = "\n  ".join(
        f"+ {va:_} @ ${{dataset.{g}.val.dataset_str}}"
        for g, _, _, _, _, va in datasets
    ).lstrip("+ ")
    w(f"dataset/{name}.yaml", f"""
# {note}
defaults:
  - default

num_views: {num_views}
train:
  variable_num_views: true
resolution_train: ${{dataset.resolution_options.{res_key}}}

train_dataset:
  "{train}"

test_dataset:
  "{test}"
""")


megatrain("megatrain_13d_518_many_ar_48ipg_64g", MEGA_13, 4,
          "518_many_ar", "Stage-1 recipe: 13 datasets, 518 px, 48 images/chip, 64-chip pod")
megatrain("megatrain_13d_518_many_ar_24ipg_16g", MEGA_13, 4,
          "518_many_ar", "13 datasets, 518 px, 24 images/chip, 16 chips")
megatrain("megatrain_13d_518_many_ar_24ipg_8g", MEGA_13, 4,
          "518_many_ar", "13 datasets, 518 px, 24 images/chip, 8 chips")
megatrain("megatrain_13d_512_many_ar_24ipg_16g", MEGA_13, 4,
          "512_many_ar", "13 datasets, 512 px (CroCo encoder ablations)")
megatrain("megatrain_13d_518_many_ar_48ipg_8g_mono", MEGA_13, 1,
          "518_many_ar", "Monocular variant (num_views=1)")
megatrain("megatrain_6d_518_many_ar_48ipg_64g", MEGA_6, 4,
          "518_many_ar", "6-dataset subset, 64 chips")
megatrain("megatrain_6d_518_many_ar_48ipg_8g", MEGA_6, 4,
          "518_many_ar", "6-dataset subset, 8 chips")

# Stage-2: 24-view curriculum (reference mapa_curri_24v_13d_48ipg_64g.sh)
megatrain("megatrain_13d_518_many_ar_24v_48ipg_64g", MEGA_13, 24,
          "518_many_ar", "Stage-2 recipe: up to 24 views per set")

w("dataset/bmvs_518_many_ar_48ipg_8g.yaml", """
# Single-dataset (BlendedMVS) run
defaults:
  - default

num_views: 4
resolution_train: ${dataset.resolution_options.518_many_ar}
train_dataset: "420_000 @ ${dataset.blendedmvs_wai.train.dataset_str}"
test_dataset: "4_000 @ ${dataset.blendedmvs_wai.val.dataset_str}"
""")

w("dataset/one_sample_test_data.yaml", """
# One-sample overfit harness (scripts/one_sample_finetune.py)
defaults:
  - default

num_views: 2
resolution_train: ${dataset.resolution_options.518_1_33_ar}
train_dataset: "100 @ ${dataset.blendedmvs_wai.train.dataset_str}"
test_dataset: "[null]"
""")


def benchmark_ds(name, res_base, note):
    w(f"dataset/{name}.yaml", f"""
# {note}
defaults:
  - default

num_views: 2
test:
  variable_num_views: false
resolution_test: ${{dataset.resolution_options.{res_base}_many_ar}}
test_dataset:
  "ETH3DWAI(split='test', resolution=${{dataset.resolution_test}},
    data_norm_type='${{model.data_norm_type}}', ROOT='${{root_data_dir}}/eth3d',
    dataset_metadata_dir='${{mapanything_dataset_metadata_dir}}',
    num_views=${{dataset.num_views}}, covisibility_thres=0.025)
  + ScanNetPPWAI(split='test', resolution=${{dataset.resolution_test}},
    data_norm_type='${{model.data_norm_type}}', ROOT='${{root_data_dir}}/scannetppv2',
    dataset_metadata_dir='${{mapanything_dataset_metadata_dir}}',
    num_views=${{dataset.num_views}}, covisibility_thres=0.25)
  + TartanAirV2WBWAI(split='test', resolution=${{dataset.resolution_test}},
    data_norm_type='${{model.data_norm_type}}', ROOT='${{root_data_dir}}/tav2_wb',
    dataset_metadata_dir='${{mapanything_dataset_metadata_dir}}',
    num_views=${{dataset.num_views}}, covisibility_thres=0.25)"
""")


benchmark_ds("benchmark_518_eth3d_snpp_tav2", 518,
             "Dense up-to-N-view benchmark sets at 518 px")
benchmark_ds("benchmark_512_eth3d_snpp_tav2", 512,
             "Dense up-to-N-view benchmark sets at 512 px (CroCo models)")
benchmark_ds("benchmark_sv_calib_518_many_ar_eth3d_snpp_tav2", 518,
             "Single-view calibration benchmark sets (num_views overridden to 1)")

# --- machine ---------------------------------------------------------------
w("machine/default.yaml", """
# Root directory containing all WAI-format datasets
root_data_dir: ???
# Dataset metadata directory (scene list npys)
mapanything_dataset_metadata_dir: ???
# Pretrained checkpoints (converted torch -> flax msgpack/orbax)
root_pretrained_checkpoints_dir: ???
# Experiment logs / checkpoints
root_experiments_dir: ???
# External benchmark data (RMVD test data)
external_benchmark_data_root_data_dir: ???
""")
w("machine/local.yaml", """
defaults:
  - default

root_data_dir: /root/data/wai
mapanything_dataset_metadata_dir: /root/data/mapanything_dataset_metadata
root_pretrained_checkpoints_dir: /root/data/checkpoints
root_experiments_dir: /root/experiments
external_benchmark_data_root_data_dir: /root/data/rmvd_test_data
""")
w("machine/tpu_v5e_8.yaml", """
# Single-host v5e-8: 8 chips, 16 GB HBM each
defaults:
  - local

mesh:
  data_parallelism: 8
  view_parallelism: 1
""")
w("machine/tpu_v5p_pod.yaml", """
# Multi-host v5p pod slice: jax.distributed auto-init, dp x cp mesh
defaults:
  - local

mesh:
  data_parallelism: -1   # fill remaining chips
  view_parallelism: 4
coordinator: env://      # jax.distributed.initialize from TPU env
""")

# --- distributed -------------------------------------------------------------
w("distributed/default.yaml", """
# Mesh + device layout (parallel/mesh.py). The reference's NCCL/DDP
# world_size/rank plumbing collapses to jax.distributed + named shardings.
seed: 0
# Images per chip per step (the reference's max_num_of_imgs_per_gpu)
max_num_of_imgs_per_chip: 4
# Gradient accumulation microsteps (train/step.py make_accum_train_step)
accum_iter: 1
mesh:
  data_parallelism: -1   # -1 = all remaining devices
  view_parallelism: 1
  # trunk global-attention schedule under view sharding:
  # xla_spmd | allgather | ring
  context_schedule: xla_spmd
""")

# --- train_params ------------------------------------------------------------
w("train_params/default.yaml", """
epochs: 100
lr: 1.0e-4
min_lr: 1.0e-6
warmup_epochs: 10
weight_decay: 0.05
betas: [0.9, 0.95]
grad_clip_norm: 1.0
schedule_type: linear_warmup_half_cycle_cosine_decay
# Per-submodule overrides: {submodule: {lr_scale, weight_decay, frozen}}
submodule_configs: {}
# bf16 compute (params fp32); heads/adaptors fp32 (model config)
amp: 1
amp_dtype: bf16
freeze_val_samples_across_all_epochs: true
eval_freq: 1
save_freq: 1
keep_freq: 10
print_freq: 20
resume: true
""")
for name, body in {
    "lower_encoder_lr": """
defaults: [default]
submodule_configs:
  encoder: {lr_scale: 0.1}
""",
    "lower_encoder_lr_64g": """
defaults: [default]
lr: 4.0e-4
submodule_configs:
  encoder: {lr_scale: 0.1}
""",
    "freeze_encoder": """
defaults: [default]
submodule_configs:
  encoder: {frozen: true}
""",
    "freeze_encoder_lower_sharelayer_lr": """
defaults: [default]
submodule_configs:
  encoder: {frozen: true}
  info_sharing: {lr_scale: 0.1}
""",
    "finetune_with_lower_encoder_lr": """
defaults: [default]
lr: 2.0e-5
min_lr: 1.0e-7
warmup_epochs: 2
submodule_configs:
  encoder: {lr_scale: 0.1}
""",
    "finetune_with_lower_encoder_lr_64g": """
defaults: [default]
lr: 8.0e-5
min_lr: 1.0e-7
warmup_epochs: 2
submodule_configs:
  encoder: {lr_scale: 0.1}
""",
    "vggt_finetune": """
defaults: [default]
lr: 2.0e-5
warmup_epochs: 2
submodule_configs:
  aggregator: {lr_scale: 0.1}
""",
    "pi3_finetune": """
defaults: [default]
lr: 2.0e-5
warmup_epochs: 2
submodule_configs:
  encoder: {lr_scale: 0.1}
""",
    "moge2_finetune": """
defaults: [default]
lr: 1.0e-5
warmup_epochs: 1
submodule_configs:
  backbone: {lr_scale: 0.1}
""",
}.items():
    w(f"train_params/{name}.yaml", body)

# --- loss --------------------------------------------------------------------
w("loss/default.yaml", open(ROOT / "loss/overall_loss.yaml").read())
for name, body in {
    "overall_loss_weigh_pm_higher": """
defaults: [overall_loss]
world_points_weight: 2.0
""",
    "overall_loss_add_color": """
defaults: [overall_loss]
rgb_loss_weight: 1.0
""",
    "overall_disentangled_loss": """
defaults: [overall_loss]
# Disentangled variant (reference losses.py:4521): supervise each factored
# quantity against GT versions of the others (no cross-term gradients).
disentangled: true
""",
    "entangled_metric_loss": """
defaults: [overall_loss]
loss_in_log: false
norm_mode: none
""",
    "up_to_scale_loss": """
defaults: [overall_loss]
scale_weight: 0.0
""",
    "no_points_loss": """
defaults: [overall_loss]
world_points_weight: 0.0
cam_points_weight: 0.0
""",
    "no_depth_loss": """
defaults: [overall_loss]
depth_weight: 0.0
""",
    "no_ray_dirs_loss": """
defaults: [overall_loss]
ray_directions_weight: 0.0
""",
    "no_pose_loss": """
defaults: [overall_loss]
pose_quats_weight: 0.0
pose_trans_weight: 0.0
""",
    "no_robust_loss": """
defaults: [overall_loss]
criterion: l1
""",
    "no_log_scaling": """
defaults: [overall_loss]
loss_in_log: false
""",
    "conf_pm_mask_loss": """
defaults: [overall_loss]
# pointmap + conf + mask only (VGGT-style scene rep ablation)
depth_weight: 0.0
ray_directions_weight: 0.0
pose_quats_weight: 0.0
pose_trans_weight: 0.0
scale_weight: 0.0
""",
    "conf_pm_mask_scale_loss": """
defaults: [conf_pm_mask_loss]
scale_weight: 1.0
""",
    "vggt_loss": """
defaults: [overall_loss]
criterion: l1
normal_loss_weight: 0.0
gm_loss_weight: 0.0
""",
    "pi3_loss": """
defaults: [overall_loss]
conf_alpha: 0.0
normal_loss_weight: 0.0
""",
    "moge2_loss": """
defaults: [overall_loss]
norm_mode: avg_dis
conf_alpha: 0.0
""",
}.items():
    w(f"loss/{name}.yaml", body)

# --- model additions ----------------------------------------------------------
w("model/default.yaml", """
defaults:
  - encoder: dinov2_large
  - info_sharing: aat_ifr_24_layers
  - pred_head: dpt_pose_scale
  - task: aug_training

model_str: mapanything
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""")
for name, body in {
    "mapanything_ablations": """
defaults:
  - encoder: dinov2_large
  - info_sharing: aat_ifr_24_layers
  - pred_head: dpt_pose
  - task: aug_training
model_str: mapanything_ablations
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""",
    "mapanything_dpt_rgb": """
defaults:
  - encoder: dinov2_large
  - info_sharing: aat_ifr_24_layers
  - pred_head: dpt_rgb_pose_scale
  - task: rgb_prediction
model_str: mapanything
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""",
    "mapanything_moge_rgb": """
defaults:
  - encoder: dinov2_large
  - info_sharing: aat_ifr_24_layers
  - pred_head: moge_pose_scale
  - task: rgb_prediction
model_str: mapanything
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""",
    "mapanything_mae_rgb": """
defaults:
  - encoder: dinov2_large
  - info_sharing: aat_ifr_24_layers
  - pred_head: mae_pose_scale
  - task: rgb_prediction
model_str: mapanything
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""",
    "modular_dust3r_512_dpt": """
defaults:
  - encoder: croco_512
  - info_sharing: cat_ifr_dust3r
  - pred_head: dpt
  - task: images_only
model_str: modular_dust3r
compute_dtype: bfloat16
data_norm_type: ${model.encoder.data_norm_type}
""",
    "dust3r": """
model_str: dust3r_ba
external: true
resolution: 512
""",
    "metric_dust3r": """
model_str: metric_dust3r
external: true
resolution: 512
""",
    "mast3r": """
model_str: mast3r_sga
external: true
resolution: 512
""",
    "must3r": """
model_str: must3r
external: true
resolution: 512
""",
    "pi3": """
model_str: pi3
external: true
resolution: 518
""",
    "pow3r": """
model_str: pow3r
external: true
resolution: 512
""",
    "pow3r_ba": """
model_str: pow3r_ba
external: true
resolution: 512
""",
    "moge_1": """
model_str: moge_1
external: true
resolution: 518
""",
    "moge_2": """
model_str: moge_2
external: true
resolution: 518
""",
    "vggt": """
model_str: vggt
external: true
resolution: 518
""",
    "vggt_commercial": """
model_str: vggt
external: true
resolution: 518
commercial_weights: true
""",
    "vggt_non_pretrained": """
model_str: vggt
external: true
resolution: 518
pretrained: false
""",
    "anycalib": """
model_str: anycalib
external: true
resolution: 518
""",
}.items():
    w(f"model/{name}.yaml", body)

for name, body in {
    "aat_ifr_24_layers_no_ref_view": """
model_type: alternating_attention
depth: 24
dim: 768
num_heads: 12
indices: [11, 17]
distinguish_ref_and_non_ref_views: false
use_pe_for_non_reference_views: false
use_scalable_softmax: false
use_entropy_scaling: false
""",
    "aat_ifr_24_layers_w_view_pe": """
model_type: alternating_attention
depth: 24
dim: 768
num_heads: 12
indices: [11, 17]
distinguish_ref_and_non_ref_views: true
use_pe_for_non_reference_views: true
use_rand_idx_pe_for_non_reference_views: true
max_num_views_for_pe: 1000
use_scalable_softmax: false
use_entropy_scaling: false
""",
    "aat_ifr_48_layers": """
model_type: alternating_attention
depth: 48
dim: 768
num_heads: 12
indices: [23, 35]
distinguish_ref_and_non_ref_views: true
use_pe_for_non_reference_views: false
use_scalable_softmax: false
use_entropy_scaling: false
""",
    "aat_ifr_48_layers_escaling": """
model_type: alternating_attention
depth: 48
dim: 768
num_heads: 12
indices: [23, 35]
distinguish_ref_and_non_ref_views: true
use_pe_for_non_reference_views: false
use_scalable_softmax: false
use_entropy_scaling: true
""",
    "aat_ifr_48_layers_no_ref_view": """
model_type: alternating_attention
depth: 48
dim: 768
num_heads: 12
indices: [23, 35]
distinguish_ref_and_non_ref_views: false
use_pe_for_non_reference_views: false
use_scalable_softmax: false
use_entropy_scaling: false
""",
    "gat_ifr_24_layers_escaling": """
model_type: global_attention
depth: 24
dim: 768
num_heads: 12
indices: [11, 17]
use_entropy_scaling: true
""",
    "cat_ifr_dust3r": """
model_type: cross_attention
depth: 12
dim: 768
num_heads: 12
indices: [5, 8]
""",
}.items():
    w(f"model/info_sharing/{name}.yaml", body)

for name, body in {
    "dpt": """
type: dpt
dpt_feature_dim: 256
dpt_hooks: [0, 1, 2, 3]
dpt_layer_dims: [96, 192, 384, 768]
scene_rep_type: pointmap
with_confidence: true
with_mask: false
adaptors: {depth_mode: exp, confidence_type: exp, confidence_vmin: 1.0}
""",
    "dpt_pose": """
type: dpt+pose
dpt_feature_dim: 256
dpt_hooks: [0, 1, 2, 3]
dpt_layer_dims: [96, 192, 384, 768]
pose_head_num_resconv: 2
scene_rep_type: raydirs+depth+pose
with_confidence: true
with_mask: true
adaptors: {depth_mode: exp, confidence_type: exp, confidence_vmin: 1.0}
""",
    "dpt_scale": """
type: dpt+scale
dpt_feature_dim: 256
dpt_hooks: [0, 1, 2, 3]
dpt_layer_dims: [96, 192, 384, 768]
scene_rep_type: pointmap
with_confidence: true
with_mask: true
adaptors:
  depth_mode: exp
  confidence_type: exp
  confidence_vmin: 1.0
  scale_mode: exp
  scale_vmin: 1.0e-08
""",
    "dpt_rgb_pose_scale": """
type: dpt+pose
dpt_feature_dim: 256
dpt_hooks: [0, 1, 2, 3]
dpt_layer_dims: [96, 192, 384, 768]
pose_head_num_resconv: 2
scene_rep_type: raydirs+depth+rgb+pose
with_confidence: true
with_mask: true
adaptors:
  depth_mode: exp
  confidence_type: exp
  confidence_vmin: 1.0
  scale_mode: exp
  scale_vmin: 1.0e-08
""",
    "moge_pose_scale": """
type: moge+pose
dense_head_type: moge
pose_head_num_resconv: 2
scene_rep_type: raydirs+depth+rgb+pose
with_confidence: true
with_mask: true
adaptors:
  depth_mode: exp
  confidence_type: exp
  confidence_vmin: 1.0
  scale_mode: exp
  scale_vmin: 1.0e-08
""",
    "mae_pose_scale": """
type: mae+pose
dense_head_type: mae
pose_head_num_resconv: 2
scene_rep_type: raydirs+depth+rgb+pose
with_confidence: true
with_mask: true
adaptors:
  depth_mode: exp
  confidence_type: exp
  confidence_vmin: 1.0
  scale_mode: exp
  scale_vmin: 1.0e-08
""",
}.items():
    w(f"model/pred_head/{name}.yaml", body)

ADAPTORS = {
    "raydirs_depth_pose_confidence_mask_scale": ("raydirs+depth+pose", 6, True, True, True),
    "raydirs_depth_pose_confidence_mask": ("raydirs+depth+pose", 6, True, True, False),
    "raydirs_depth_rgb_pose_confidence_mask_scale": ("raydirs+depth+rgb+pose", 9, True, True, True),
    "pointmap_confidence": ("pointmap", 3, True, False, False),
    "pointmap_confidence_mask": ("pointmap", 3, True, True, False),
    "pointmap_confidence_mask_scale": ("pointmap", 3, True, True, True),
    "campointmap_pose_confidence_mask": ("campointmap+pose", 3, True, True, False),
    "campointmap_pose_confidence_mask_scale": ("campointmap+pose", 3, True, True, True),
    "pointmap_raydirs_depth_pose_confidence_mask_scale": ("pointmap+raydirs+depth+pose", 7, True, True, True),
    "pointmap_factored_raydirs_depth_pose_confidence_mask_scale": ("pointmap+raydirs+depth+pose", 7, True, True, True),
}
for name, (rep, dim, conf, mask, scale) in ADAPTORS.items():
    factored = "factored" in name
    w(f"model/pred_head/adaptor_config/{name}.yaml", f"""
scene_rep_type: {rep}
input_dim: {dim + int(conf) + int(mask)}
with_confidence: {str(conf).lower()}
with_mask: {str(mask).lower()}
with_scale: {str(scale).lower()}
use_factored_predictions_for_global_pointmaps: {str(factored).lower()}
""")

w("model/encoder/radio_v2_5_large.yaml", """
encoder_str: radio
name: radio_v2_5_large
size: large
patch_size: 16
data_norm_type: radio
""")
w("model/encoder/croco_512_data_norm_dust3r.yaml", """
encoder_str: croco
name: croco_512_dust3r
size: large
patch_size: 16
img_size: 512
data_norm_type: dust3r
""")
w("model/encoder/dinov2_large_feature_returner.yaml", """
encoder_str: vit
name: dinov2_large_feature_returner
size: large
patch_size: 14
data_norm_type: dinov2
feature_returner: true
return_layers: [11, 17, 23]
""")
w("model/task/default.yaml", """
# Encoder configs for the optional geometric modalities
# (dense rep for rays/depth, global rep for pose/scale; fixed by the
# model architecture — see models/mapanything.py steps 3-5)
overall_prob: 0
dropout_prob: 1
ray_dirs_prob: 0
depth_prob: 0
cam_prob: 0
sparse_depth_prob: 0
sparsification_removal_percent: 0
depth_scale_norm_all_prob: 0
pose_scale_norm_all_prob: 0
""")

# --- top-level apps -----------------------------------------------------------
w("train.yaml", """
defaults:
  - machine: local
  - model: mapanything
  - dataset: megatrain_13d_518_many_ar_48ipg_64g
  - loss: overall_loss
  - train_params: default
  - distributed: default

output_dir: ${root_experiments_dir}/train
root_data_dir: ${machine.root_data_dir}
mapanything_dataset_metadata_dir: ${machine.mapanything_dataset_metadata_dir}
root_pretrained_checkpoints_dir: ${machine.root_pretrained_checkpoints_dir}
root_experiments_dir: ${machine.root_experiments_dir}
seed: 0
""")
w("finetune.yaml", """
defaults:
  - machine: local
  - model: mapanything
  - dataset: one_sample_test_data
  - loss: overall_loss
  - train_params: finetune_with_lower_encoder_lr
  - distributed: default

output_dir: ${root_experiments_dir}/finetune
root_data_dir: ${machine.root_data_dir}
mapanything_dataset_metadata_dir: ${machine.mapanything_dataset_metadata_dir}
root_pretrained_checkpoints_dir: ${machine.root_pretrained_checkpoints_dir}
root_experiments_dir: ${machine.root_experiments_dir}
pretrained_checkpoint: ???
seed: 0
""")
w("dense_n_view_benchmark.yaml", """
defaults:
  - machine: local
  - model: mapanything
  - dataset: benchmark_518_eth3d_snpp_tav2

output_dir: ${root_experiments_dir}/benchmark/dense_n_view
root_data_dir: ${machine.root_data_dir}
mapanything_dataset_metadata_dir: ${machine.mapanything_dataset_metadata_dir}
root_experiments_dir: ${machine.root_experiments_dir}
checkpoint: ???
views: [2, 4, 8, 16, 24, 32, 50]
batch_size: 1
amp: 1
""")
w("calibration_benchmark.yaml", """
defaults:
  - machine: local
  - model: mapanything
  - dataset: benchmark_sv_calib_518_many_ar_eth3d_snpp_tav2

output_dir: ${root_experiments_dir}/benchmark/calibration
root_data_dir: ${machine.root_data_dir}
mapanything_dataset_metadata_dir: ${machine.mapanything_dataset_metadata_dir}
root_experiments_dir: ${machine.root_experiments_dir}
checkpoint: ???
batch_size: 4
""")
w("rmvd_benchmark.yaml", """
defaults:
  - machine: local
  - model: mapanything

output_dir: ${root_experiments_dir}/benchmark/rmvd
root_data_dir: ${machine.root_data_dir}
external_benchmark_data_root_data_dir: ${machine.external_benchmark_data_root_data_dir}
root_experiments_dir: ${machine.root_experiments_dir}
checkpoint: ???
eval_dataset: [kitti, scannet, eth3d, dtu, tanks_and_temples]
""")
w("inference.yaml", """
defaults:
  - model: mapanything

checkpoint: ???
memory_efficient_inference: false
apply_mask: true
mask_edges: true
resolution: 518
""")

print("generated", sum(1 for _ in ROOT.rglob("*.yaml")), "yaml files total")
