"""fix_noise capability: pinned noise makes the generator deterministic
across calls (the reference's flicker-prevention feature,
ppst_model.py:250-262)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppst_tpu.models.config import PPSTConfig
from ppst_tpu.models.generator import Generator, make_fixed_noise


def test_fixed_noise_is_deterministic(rng):
    cfg = PPSTConfig(crop_size=64)
    g = Generator(cfg)
    sp = jnp.asarray(rng.standard_normal((2, 8, 8, 256)).astype(np.float32))
    gl = [jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))] * 4
    params = g.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        sp, gl, extract_features=True,
    )
    noises = make_fixed_noise(cfg, jax.random.PRNGKey(7), 2, 64)
    assert len(noises) == 2 * cfg.netG_num_base_resnet_layers + 2 * 3
    assert noises[0].shape == (2, 8, 8, 1)
    assert noises[-1].shape == (2, 64, 64, 1)

    a = g.apply(params, sp, gl, noises=noises, rngs={"noise": jax.random.PRNGKey(2)})
    b = g.apply(params, sp, gl, noises=noises, rngs={"noise": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # without pinning, different rngs give different outputs... but only
    # when some noise gain is nonzero; bump one gain to check wiring
    import flax

    p = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    tree = p["params"]["head0"]["conv1"]["noise"]
    tree["weight"] = jnp.ones_like(tree["weight"])
    c = g.apply(p, sp, gl, rngs={"noise": jax.random.PRNGKey(2)})
    d = g.apply(p, sp, gl, rngs={"noise": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(c), np.asarray(d))
