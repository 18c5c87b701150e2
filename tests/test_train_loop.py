"""Trainer smoke test: two epochs on synthetic data + checkpoint resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mapanything_tpu.data.loader import MultiViewDataLoader, get_test_data_loader
from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig
from mapanything_tpu.train.loop import (
    Trainer,
    TrainLoopConfig,
    loss_batch_from_numpy,
)
from mapanything_tpu.train.step import views_from_loss_batch
from test_data_layer import make_ds


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    ds = 4 @ make_ds(num_views=2, resolution=(56, 56))
    loader = MultiViewDataLoader(ds, images_per_batch=4, num_workers=1)
    loader.set_epoch(0)
    batch_np = next(iter(loader))
    model = MapAnything(MapAnythingConfig.small())
    batch = loss_batch_from_numpy(batch_np)
    views = views_from_loss_batch(batch, jnp.asarray(batch_np["img"]))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)["params"]
    return ds, loader, model, params, tmp_path_factory.mktemp("run")


def test_trainer_runs_and_resumes(tiny_setup):
    ds, loader, model, params, outdir = tiny_setup
    cfg = TrainLoopConfig(
        output_dir=str(outdir), epochs=2, warmup_epochs=0.5,
        print_freq=100, save_freq=1,
    )
    trainer = Trainer(model, loader, cfg, init_params=params)
    state = trainer.train()
    assert int(state.step) > 0
    # JSON-lines log written
    log = (outdir / "log.txt").read_text().strip().splitlines()
    assert len(log) == 2

    # Resume: a fresh trainer must pick up from the checkpoint
    trainer2 = Trainer(model, loader, cfg, init_params=params)
    assert trainer2.start_epoch == 2
    p_new = jax.tree.leaves(trainer2.state.params)[0]
    p_trained = jax.tree.leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(p_new), np.asarray(p_trained))


def test_loss_decreases_with_training(tiny_setup):
    ds, loader, model, params, outdir = tiny_setup
    cfg = TrainLoopConfig(
        output_dir=str(outdir / "overfit"), epochs=3, warmup_epochs=0.0,
        lr=3e-4, print_freq=100, resume=False,
    )
    trainer = Trainer(model, loader, cfg, init_params=params)
    losses = []
    for epoch in range(3):
        stats = trainer.train_one_epoch(epoch)
        losses.append(stats["train_loss"])
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_one_sample_finetune_converges(capsys):
    """scripts/one_sample_finetune.py overfits one synthetic sample
    (reference train/one_sample_finetune.py:44) — loss must drop."""
    import re
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import one_sample_finetune

    argv = sys.argv
    sys.argv = ["one_sample_finetune.py", "--small", "--steps", "30",
                "--resolution", "28", "--lr", "1e-3"]
    try:
        one_sample_finetune.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    losses = [float(m) for m in re.findall(r"loss ([0-9.]+)", out)]
    assert len(losses) >= 3
    assert losses[-1] < losses[0] * 0.9, losses


def test_trainer_gradient_accumulation(tiny_setup, tmp_path):
    """accum_iter > 1: one optimizer step per group, shape-change flushes,
    loss stays finite (reference training.py:433,512-526)."""
    from mapanything_tpu.train.loop import Trainer, TrainLoopConfig

    ds, loader, model, params, _ = tiny_setup
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=1, warmup_epochs=0.1,
        print_freq=100, accum_iter=2, resume=False,
    )
    trainer = Trainer(model, loader, cfg, init_params=params)
    n_batches = len(loader)
    stats = trainer.train_one_epoch(0)
    assert np.isfinite(stats["train_loss"])
    # one optimizer step per accum group (same-shape tiny loader)
    assert int(trainer.state.step) == (n_batches + 1) // 2


def test_trainer_on_mesh(tiny_setup, tmp_path):
    """Trainer with a (data, view) mesh: batches sharded, params
    replicated, one epoch runs to a finite loss on the virtual mesh."""
    import jax

    from mapanything_tpu.parallel.mesh import make_mesh
    from mapanything_tpu.train.loop import Trainer, TrainLoopConfig

    ds, loader, model, params, _ = tiny_setup
    mesh = make_mesh(jax.devices()[:4], view_parallelism=2)
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=1, warmup_epochs=0.1,
        print_freq=100, resume=False,
    )
    trainer = Trainer(model, loader, cfg, init_params=params, mesh=mesh)
    with mesh:
        stats = trainer.train_one_epoch(0)
    assert np.isfinite(stats["train_loss"])


def test_checkpoint_best_saved(tiny_setup, tmp_path):
    """Trainer saves a separate best checkpoint when the test loss improves
    (reference training.py:237-287 'checkpoint-best')."""
    ds, loader, model, params, _ = tiny_setup
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=2, warmup_epochs=0.1,
        print_freq=100, resume=False,
    )
    trainer = Trainer(
        model, loader, cfg, test_loader=loader, init_params=params
    )
    trainer.train()
    meta = trainer.ckpt_best.load_metadata()
    assert meta is not None and "best_loss" in meta
    assert trainer.ckpt_best.latest_step() is not None
    assert np.isfinite(trainer.best_loss)

    # Resume restores the best-so-far threshold.
    cfg2 = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=2, warmup_epochs=0.1,
        print_freq=100, resume=True,
    )
    trainer2 = Trainer(model, loader, cfg2, init_params=params)
    assert trainer2.best_loss == pytest.approx(meta["best_loss"])


def test_trailing_accum_flush_forensics(tiny_setup, tmp_path):
    """The trailing (partial) accumulation group gets the same
    loss-explosion forensic check as full groups (VERDICT r2 weak #3c)."""
    ds, loader, model, params, _ = tiny_setup
    n_batches = len(loader)
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=1, warmup_epochs=0.1,
        print_freq=100, resume=False,
        accum_iter=n_batches + 1,   # only the trailing flush ever runs
        max_loss_explosion=0.0,     # any positive loss counts as explosion
    )
    trainer = Trainer(model, loader, cfg, init_params=params)
    with pytest.raises(FloatingPointError):
        trainer.train_one_epoch(0)
    # forensic artifacts dumped
    debug = list((tmp_path / "debug").glob("bad_batch_*.pkl"))
    assert len(debug) == 1


def test_eval_batches_sharded_on_mesh(tiny_setup, tmp_path):
    """test_one_epoch places eval batches with (data, view) sharding on the
    mesh (VERDICT r2 weak #3b: eval used default placement)."""
    import jax

    from mapanything_tpu.parallel.mesh import make_mesh

    ds, loader, model, params, _ = tiny_setup
    mesh = make_mesh(jax.devices()[:4], view_parallelism=2)
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=1, warmup_epochs=0.1,
        print_freq=100, resume=False,
    )
    trainer = Trainer(
        model, loader, cfg, test_loader=loader, init_params=params, mesh=mesh
    )
    calls = []
    orig = trainer._shard_batch

    def spy(img, batch):
        out = orig(img, batch)
        calls.append(out[0].sharding)
        return out

    trainer._shard_batch = spy
    with mesh:
        stats = trainer.test_one_epoch(0)
    assert np.isfinite(stats["test_loss"])
    assert len(calls) == len(loader)
    assert not calls[0].is_fully_replicated


def test_accum_groups_sharded_on_mesh(tiny_setup, tmp_path):
    """Gradient-accumulation stacks are (data, view)-sharded on the mesh."""
    import jax

    from mapanything_tpu.parallel.mesh import make_mesh

    ds, loader, model, params, _ = tiny_setup
    mesh = make_mesh(jax.devices()[:4], view_parallelism=2)
    cfg = TrainLoopConfig(
        output_dir=str(tmp_path), epochs=1, warmup_epochs=0.1,
        print_freq=100, resume=False, accum_iter=2,
    )
    trainer = Trainer(model, loader, cfg, init_params=params, mesh=mesh)
    with mesh:
        stats = trainer.train_one_epoch(0)
    assert np.isfinite(stats["train_loss"])


class TestAdamDtypes:
    """scale_by_adam_dtypes: optax parity in fp32; bounded error with
    bf16-quantized moment STORAGE (the 16 GB-edge memory knob)."""

    def _grads_params(self, seed=0):
        import numpy as np

        rng = np.random.RandomState(seed)
        params = {
            "w": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
            "b": jnp.asarray(rng.randn(8).astype(np.float32)),
        }
        grads = [
            {
                "w": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
                "b": jnp.asarray(rng.randn(8).astype(np.float32)),
            }
            for _ in range(5)
        ]
        return params, grads

    def test_fp32_matches_optax(self):
        import numpy as np
        import optax

        from mapanything_tpu.train.optim import scale_by_adam_dtypes

        params, grads = self._grads_params()
        ref = optax.scale_by_adam(b1=0.9, b2=0.95)
        got = scale_by_adam_dtypes(b1=0.9, b2=0.95)
        s_ref, s_got = ref.init(params), got.init(params)
        for g in grads:
            u_ref, s_ref = ref.update(g, s_ref)
            u_got, s_got = got.update(g, s_got)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(u_got[k]), np.asarray(u_ref[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )

    def test_bf16_moments_bounded_error(self):
        import numpy as np
        import optax

        from mapanything_tpu.train.optim import scale_by_adam_dtypes

        params, grads = self._grads_params(seed=1)
        ref = optax.scale_by_adam(b1=0.9, b2=0.95)
        got = scale_by_adam_dtypes(
            b1=0.9, b2=0.95, mu_dtype="bfloat16", nu_dtype="bfloat16"
        )
        s_ref, s_got = ref.init(params), got.init(params)
        for g in grads:
            u_ref, s_ref = ref.update(g, s_ref)
            u_got, s_got = got.update(g, s_got)
        assert s_got.nu["w"].dtype == jnp.bfloat16
        for k in params:
            a, b = np.asarray(u_got[k], np.float32), np.asarray(u_ref[k])
            # bf16 storage: ~2^-9 relative mantissa error through the
            # sqrt; allow 2% relative on the update direction.
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2, err_msg=k)

    def test_build_optimizer_nu_dtype_trains(self):
        import numpy as np
        import optax

        from mapanything_tpu.train.optim import OptimConfig, build_optimizer

        params = {"w": jnp.ones((4, 4))}
        opt = build_optimizer(
            OptimConfig(lr=1e-2, epoch_len=10, total_epochs=1.0,
                        mu_dtype="bfloat16", nu_dtype="bfloat16"),
            params,
        )
        state = opt.init(params)
        g = {"w": jnp.ones((4, 4))}
        for _ in range(3):
            updates, state = opt.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert bool(jnp.all(jnp.isfinite(params["w"])))
        assert float(jnp.max(params["w"])) < 1.0  # moved downhill
