import numpy as np
import pytest

from sfd2_tpu.pipeline.extractors import BaselineConfig, dynamic_load


@pytest.mark.parametrize(
    "name", ["superpoint", "r2d2", "sift", "sfd2", "d2net", "caps", "sgd2"]
)
def test_extractor_contract(name, rng):
    cfg = BaselineConfig(max_keypoints=128, conf_threshold=1e-5)
    extract = dynamic_load(name, cfg)
    img = rng.random((96, 128, 3)).astype(np.float32)
    f = extract(img)
    assert f.keypoints.ndim == 2 and f.keypoints.shape[1] == 2
    assert len(f.keypoints) == len(f.scores) == len(f.descriptors)
    assert len(f.keypoints) <= 128
    if len(f.keypoints):
        assert np.all(f.keypoints[:, 0] < 128 + 32)  # padded area tolerance
        if name != "caps":  # CAPS descriptors are raw coarse‖fine concat
            np.testing.assert_allclose(
                np.linalg.norm(f.descriptors, axis=1), 1.0, atol=1e-3
            )
        else:
            assert f.descriptors.shape[1] == 256


def test_unknown_extractor_raises():
    with pytest.raises(KeyError):
        dynamic_load("nope")


def test_r2d2_full_res_maps(rng):
    import jax
    import jax.numpy as jnp

    from sfd2_tpu.models.r2d2 import QuadL2NetConfCFS

    model = QuadL2NetConfCFS(dim=32)
    x = jnp.zeros((1, 48, 48, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    # Dilated network: all outputs stay full resolution.
    assert out["descriptors"].shape == (1, 48, 48, 32)
    assert out["reliability"].shape == (1, 48, 48)
    assert out["repeatability"].shape == (1, 48, 48)
    r = np.asarray(out["reliability"])
    assert (r >= 0).all() and (r <= 1).all()
