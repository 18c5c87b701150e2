"""End-to-end rehearsals over a self-converted synthetic WAI scene.

VERDICT r1 items 4 & 9: (a) the full stage-1 config recipe must COMPOSE
and BUILD end-to-end (configs/train.yaml + megatrain DSL -> 13 dataset
objects -> loader -> one real train step); (b) the dense N-view benchmark
harness must run beyond unit fixtures: raw scene -> WAI conversion ->
covisibility -> metadata aggregation -> dataset -> 518-px bucket loader ->
model forward -> metrics -> JSON.

Reference matches: benchmarking/dense_n_view/benchmark.py:307;
configs/dataset/megatrain_13d_518_many_ar_48ipg_64g.yaml.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from mapanything_tpu.data_processing.aggregate import aggregate_dataset_metadata
from mapanything_tpu.data_processing.conversion import convert_scenes, get_adapter
from mapanything_tpu.data_processing.covisibility import (
    compute_pairwise_covisibility,
    write_covisibility,
)
from mapanything_tpu.data import wai as wai_io
from mapanything_tpu.utils.exr import write_depth_exr


def _make_tav2_raw(root, n_frames=4, h=560, w=640):
    """Synthetic raw TartanAirV2 layout at a realistic resolution."""
    import cv2

    rng = np.random.RandomState(1)
    scene = Path(root) / "TestEnv"
    for d in ("images", "depth", "camera_params", "poses"):
        (scene / d).mkdir(parents=True)
    K = np.array([[w * 0.8, 0, w / 2], [0, w * 0.8, h / 2], [0, 0, 1.0]])
    for i in range(n_frames):
        n = f"{i:08d}_0"
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(scene / "images" / f"{n}.png"), img)
        # A smooth sloped depth field (keeps covisibility high).
        yy = np.linspace(2.0, 4.0, h, dtype=np.float32)[:, None]
        depth = np.broadcast_to(yy, (h, w)).copy() + rng.uniform(0, 0.1, (h, w)).astype(np.float32)
        write_depth_exr(scene / "depth" / f"{n}.exr", depth)
        np.save(scene / "camera_params" / f"{n}.npy", K)
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.05, 0, 0]
        np.save(scene / "poses" / f"{n}.npy", pose)


@pytest.fixture(scope="module")
def wai_fixture(tmp_path_factory):
    """Raw -> WAI -> covisibility -> aggregated metadata, once per module."""
    tmp = tmp_path_factory.mktemp("e2e")
    raw, out, md = tmp / "raw", tmp / "wai", tmp / "md"
    _make_tav2_raw(raw)
    convert_scenes(get_adapter("tav2_wb"), raw, out, link_files=False)

    meta = wai_io.load_scene_meta(out / "TestEnv")
    depths, Ks, poses = [], [], []
    for fr in meta["frames"]:
        d = wai_io.load_frame(
            out / "TestEnv", fr["frame_name"],
            ["depth", "intrinsics", "pose"], meta=meta,
        )
        depths.append(d["depth"])
        Ks.append(d["intrinsics"])
        poses.append(d["pose"])
    covis = compute_pairwise_covisibility(
        np.stack(depths), np.stack(Ks), np.stack(poses)
    )
    write_covisibility(out / "TestEnv", covis)
    aggregate_dataset_metadata("tav2_wb", out, md, with_adjacency=True)

    # Mirror the single converted scene as every megatrain dataset: symlink
    # per-dataset roots and write each metadata prefix's scene list.
    data_root = tmp / "data"
    data_root.mkdir()
    prefixes = {
        "ase": "ase", "blendedmvs": "blendedmvs", "dl3dv": "dl3dv",
        "dynamicreplica": "dynamicreplica", "megadepth": "megadepth",
        "mpsd": "mpsd", "mvs_synth": "mvs_synth",
        "paralleldomain4d": "paralleldomain4d", "sailvos3d": "sailvos3d",
        "scannetppv2": "scannetppv2", "spring": "spring",
        "tav2_wb": "tav2_wb", "unrealstereo4k": "unrealstereo4k",
    }
    (md / "train").mkdir(exist_ok=True, parents=True)
    for root_name, prefix in prefixes.items():
        link = data_root / root_name
        if not link.exists():
            os.symlink(out, link)
        np.save(md / "train" / f"{prefix}_scene_list_train.npy",
                np.asarray(["TestEnv"], object))
    return {"wai": out, "md": md, "data_root": data_root}


class TestDenseNViewRehearsal:
    def test_full_benchmark_pipeline(self, wai_fixture, tmp_path):
        """Loader -> 518px bucket -> model -> metrics -> JSON."""
        import jax

        from mapanything_tpu.benchmarking.dense_n_view import (
            METRIC_NAMES,
            run_benchmark,
        )
        from mapanything_tpu.data.datasets.wai_datasets import TartanAirV2WBWAI
        from mapanything_tpu.data.loader import MultiViewDataLoader
        from mapanything_tpu.models.mapanything import (
            MapAnything,
            MapAnythingConfig,
        )
        from mapanything_tpu.train.loop import loss_batch_from_numpy
        from mapanything_tpu.train.step import views_from_loss_batch

        ds = TartanAirV2WBWAI(
            split="train",  # the synthetic scene lands in train
            ROOT=str(wai_fixture["wai"]),
            dataset_metadata_dir=str(wai_fixture["md"]),
            num_views=2,
            resolution=(518, 392),  # a real 518-px AR bucket
            covisibility_thres=0.05,
            seed=777,
        )
        loader = MultiViewDataLoader(ds, images_per_batch=2, num_workers=1)
        loader.set_epoch(0)

        cfg = MapAnythingConfig.small(
            encoder_size="test", info_sharing_depth=2, info_sharing_dim=64,
            info_sharing_num_heads=4, info_sharing_indices=(0, 1),
            dpt_feature_dim=32, dpt_layer_dims=(16, 24, 32, 48),
        )
        model = MapAnything(cfg)
        first = next(iter(loader))
        import jax.numpy as jnp

        batch = loss_batch_from_numpy(first)
        views = views_from_loss_batch(batch, jnp.asarray(first["img"]))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)

        results = run_benchmark(
            model, params, loader, loss_batch_from_numpy, max_batches=2
        )
        assert "overall" in results and "TestEnv" in results
        for k in METRIC_NAMES:
            assert np.isfinite(results["overall"][k]), k

        out_json = tmp_path / "dense_n_view.json"
        out_json.write_text(json.dumps(results, indent=1))
        assert json.loads(out_json.read_text())["overall"]


class TestStage1RecipeComposition:
    def test_stage1_config_composes_builds_and_steps(self, wai_fixture):
        """configs/train.yaml + megatrain_13d DSL -> 13 datasets -> loader
        -> ONE sharded-free train step at test scale."""
        import sys

        import jax
        import jax.numpy as jnp

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        from train import build_dataset  # scripts/train.py

        from mapanything_tpu.data.loader import MultiViewDataLoader
        from mapanything_tpu.models.mapanything import (
            MapAnything,
            MapAnythingConfig,
        )
        from mapanything_tpu.train.loop import loss_batch_from_numpy
        from mapanything_tpu.train.losses import LossConfig
        from mapanything_tpu.train.optim import OptimConfig, build_optimizer
        from mapanything_tpu.train.step import (
            TrainState,
            make_train_step,
            views_from_loss_batch,
        )
        from mapanything_tpu.utils.config import load_config

        cfg = load_config(
            "configs/train.yaml",
            overrides=[
                f"machine.root_data_dir={wai_fixture['data_root']}",
                f"machine.mapanything_dataset_metadata_dir={wai_fixture['md']}",
                "machine.root_experiments_dir=/tmp/exp",
                "machine.root_pretrained_checkpoints_dir=/tmp/ckpt",
                "dataset.num_views=2",
                # one small square bucket keeps the smoke test fast
                "dataset.resolution_train=(126, 126)",
            ],
        )
        dsl = cfg["dataset"]["train_dataset"]
        assert "${" not in dsl and "ASEWAI(" in dsl and "UnrealStereo4KWAI(" in dsl

        dataset = build_dataset(dsl)
        # 13 datasets, each resized to its megatrain repeat factor
        assert len(dataset) == sum(
            int(tok.replace("_", ""))
            for tok in dsl.replace("+", " ").split()
            if tok.replace("_", "").isdigit()
        )

        loader = MultiViewDataLoader(dataset, images_per_batch=2, num_workers=1)
        loader.set_epoch(0)
        first = next(iter(loader))
        batch = loss_batch_from_numpy(first)
        views = views_from_loss_batch(batch, jnp.asarray(first["img"]))

        model = MapAnything(MapAnythingConfig.small(
            encoder_size="test", info_sharing_depth=2, info_sharing_dim=64,
            info_sharing_num_heads=4, info_sharing_indices=(0, 1),
            dpt_feature_dim=32, dpt_layer_dims=(16, 24, 32, 48),
        ))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
        opt_cfg = OptimConfig(epoch_len=10, total_epochs=1.0)
        optimizer = build_optimizer(opt_cfg, params)
        state = TrainState(
            params=params, opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )
        train_step = make_train_step(model, optimizer, donate=False)
        new_state, metrics = train_step(
            state, jnp.asarray(first["img"]), batch, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


def _e2e_model_and_loader(wai_fixture, num_views, images_per_batch=2):
    """Shared tail of the raw->WAI->loader->model rehearsals."""
    import jax
    import jax.numpy as jnp

    from mapanything_tpu.data.datasets.wai_datasets import TartanAirV2WBWAI
    from mapanything_tpu.data.loader import MultiViewDataLoader
    from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
    from mapanything_tpu.train.loop import loss_batch_from_numpy
    from mapanything_tpu.train.step import views_from_loss_batch

    ds = TartanAirV2WBWAI(
        split="train",
        ROOT=str(wai_fixture["wai"]),
        dataset_metadata_dir=str(wai_fixture["md"]),
        num_views=num_views,
        resolution=(518, 392),
        covisibility_thres=0.05,
        seed=778,
    )
    loader = MultiViewDataLoader(
        ds, images_per_batch=images_per_batch, num_workers=1
    )
    loader.set_epoch(0)
    cfg = MapAnythingConfig.small(
        encoder_size="test", info_sharing_depth=2, info_sharing_dim=64,
        info_sharing_num_heads=4, info_sharing_indices=(0, 1),
        dpt_feature_dim=32, dpt_layer_dims=(16, 24, 32, 48),
    )
    model = MapAnything(cfg)
    first = next(iter(loader))
    batch = loss_batch_from_numpy(first)
    views = views_from_loss_batch(batch, jnp.asarray(first["img"]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)
    return model, params, loader


class TestCalibrationRehearsal:
    def test_full_calibration_pipeline(self, wai_fixture, tmp_path):
        """Raw scene -> WAI -> 518px loader -> single-view inference ->
        ray angular error -> JSON (VERDICT r2 item 7; reference
        benchmarking/calibration/benchmark.py:33,161,216-228)."""
        from mapanything_tpu.benchmarking.calibration import run_benchmark

        model, params, loader = _e2e_model_and_loader(wai_fixture, num_views=1)
        results = run_benchmark(model, params, loader, max_batches=2)
        assert "overall" in results
        assert np.isfinite(results["overall"])
        # random weights: any angle in (0, 180]; finite is the contract
        assert 0.0 < results["overall"] <= 180.0

        out_json = tmp_path / "calibration.json"
        out_json.write_text(json.dumps(results, indent=1))
        assert json.loads(out_json.read_text())["overall"] > 0


class TestRMVDRehearsal:
    def test_full_rmvd_pipeline(self, wai_fixture, tmp_path):
        """Raw scene -> WAI -> 518px loader -> multi-view inference ->
        RobustMVD keyframe depth metrics -> JSON (VERDICT r2 item 7;
        reference benchmarking/rmvd_mvs_benchmark/benchmark.py:37)."""
        from mapanything_tpu.benchmarking.rmvd_mvs import run_benchmark

        model, params, loader = _e2e_model_and_loader(wai_fixture, num_views=2)
        results = run_benchmark(model, params, loader, max_batches=2)
        assert results["num_samples"] > 0
        assert np.isfinite(results["absrel"])
        assert 0.0 <= results["inlier103"] <= 100.0

        out_json = tmp_path / "rmvd.json"
        out_json.write_text(json.dumps(results, indent=1))
        assert json.loads(out_json.read_text())["num_samples"] > 0
