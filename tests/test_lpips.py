"""LPIPS module behavior + torch checkpoint conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppst_tpu.ops import lpips as lpips_mod


@pytest.fixture(scope="module")
def variables():
    return lpips_mod.init_params()


def test_zero_distance_for_identical(variables, rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3)
    d = lpips_mod.LPIPS().apply(variables, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_distance_increases_with_perturbation(variables, rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.3)
    n = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    d1 = float(np.mean(np.asarray(lpips_mod.LPIPS().apply(variables, x, x + 0.05 * n))))
    d2 = float(np.mean(np.asarray(lpips_mod.LPIPS().apply(variables, x, x + 0.3 * n))))
    assert 0 < d1 < d2


def test_torch_checkpoint_conversion(tmp_path, rng):
    """Convert a synthetic lpips-package-layout state dict and check the
    weights land in the right slots."""
    torch = pytest.importorskip("torch")

    sd = {}
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    tidx = [0, 3, 6, 8, 10]
    for i, (cin, cout, k) in enumerate(chans):
        sd[f"net.slice{i + 1}.{tidx[i]}.weight"] = torch.randn(cout, cin, k, k)
        sd[f"net.slice{i + 1}.{tidx[i]}.bias"] = torch.randn(cout)
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, cout, 1, 1)
    path = tmp_path / "lpips_alex.pth"
    torch.save(sd, path)

    variables = lpips_mod.load_torch_lpips(str(path))
    p = variables["params"]
    for i, (cin, cout, k) in enumerate(chans):
        assert p["net"][f"conv{i}"]["kernel"].shape == (k, k, cin, cout)
        np.testing.assert_allclose(
            p["net"][f"conv{i}"]["kernel"],
            np.transpose(sd[f"net.slice{i + 1}.{tidx[i]}.weight"].numpy(),
                         (2, 3, 1, 0)),
        )
        np.testing.assert_allclose(
            p[f"lin{i}"], sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        )
    # converted params drive the model
    x = jnp.zeros((1, 64, 64, 3))
    d = lpips_mod.LPIPS().apply(variables, x, x + 0.1)
    assert np.isfinite(np.asarray(d)).all()
