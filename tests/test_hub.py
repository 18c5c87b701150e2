"""Hub-style save/load roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from mapanything_tpu.models.mapanything import MapAnything, MapAnythingConfig, Views
from mapanything_tpu.utils.hub import from_pretrained, save_pretrained


def test_save_load_roundtrip(tmp_path):
    cfg = MapAnythingConfig.small()
    model = MapAnything(cfg)
    views = Views(img=jnp.zeros((1, 2, 28, 28, 3)))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), views)

    save_pretrained(model, params, tmp_path / "hub")
    model2, params2 = from_pretrained(tmp_path / "hub", params_template=params)

    assert model2.config.info_sharing_depth == cfg.info_sharing_depth
    assert model2.config.dense_adaptor.num_channels == cfg.dense_adaptor.num_channels

    p1 = model.apply(params, views)
    p2 = model2.apply(params2, views)
    np.testing.assert_allclose(np.asarray(p1.pts3d), np.asarray(p2.pts3d), atol=1e-6)
