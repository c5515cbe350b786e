import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sfd2_tpu.ops.nms import simple_nms
from sfd2_tpu.ops.resize import resize_bilinear
from sfd2_tpu.ops.grid_sample import grid_sample_bilinear, sample_at_points
from sfd2_tpu.ops.extract import extract_keypoints, sample_descriptors


def torch_simple_nms(scores, nms_radius):
    def max_pool(x):
        return F.max_pool2d(x, kernel_size=nms_radius * 2 + 1, stride=1, padding=nms_radius)

    zeros = torch.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.float()) > 0
        supp_scores = torch.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return torch.where(max_mask, scores, zeros)


def test_simple_nms_matches_torch(rng):
    x = rng.random((2, 64, 80)).astype(np.float32)
    ours = np.array(simple_nms(jnp.array(x), 4))
    theirs = torch_simple_nms(torch.from_numpy(x)[:, None], 4).squeeze(1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_simple_nms_radius_zero(rng):
    x = rng.random((1, 16, 16)).astype(np.float32)
    np.testing.assert_array_equal(np.array(simple_nms(jnp.array(x), 0)), x)


def test_resize_bilinear_matches_torch(rng):
    x = rng.random((2, 17, 23, 3)).astype(np.float32)
    ours = np.array(resize_bilinear(jnp.array(x), (40, 56)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = (
        F.interpolate(xt, size=(40, 56), mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_bilinear_align_corners_matches_torch(rng):
    x = rng.random((1, 9, 11, 2)).astype(np.float32)
    ours = np.array(resize_bilinear(jnp.array(x), (21, 31), align_corners=True))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = (
        F.interpolate(xt, size=(21, 31), mode="bilinear", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    fmap = rng.random((12, 15, 4)).astype(np.float32)
    grid = (rng.random((30, 2)).astype(np.float32) * 2.4) - 1.2  # includes OOB
    for align in [False, True]:
        ours = np.array(
            grid_sample_bilinear(jnp.array(fmap), jnp.array(grid), align_corners=align)
        )
        ft = torch.from_numpy(fmap).permute(2, 0, 1)[None]
        gt = torch.from_numpy(grid)[None, None]
        theirs = (
            F.grid_sample(ft, gt, mode="bilinear", align_corners=align)[0, :, 0]
            .permute(1, 0)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5, err_msg=f"align={align}")


def test_sample_descriptors_matches_reference_formula(rng):
    """Reference desc lookup: x' = x/(nw/2)-1, grid_sample align_corners=False
    then L2-norm (nets/extractor.py:199-208)."""
    h, w = 100, 120  # full res
    hc, wc = 25, 30
    desc = rng.random((hc, wc, 8)).astype(np.float32)
    pts = rng.uniform(0, [w - 1, h - 1], size=(50, 2)).astype(np.float32)

    ours = np.array(sample_descriptors(jnp.array(desc), jnp.array(pts), (h, w)))

    dt = torch.from_numpy(desc).permute(2, 0, 1)[None]
    samp = torch.from_numpy(pts.copy())
    samp[:, 0] = samp[:, 0] / (w / 2.0) - 1.0
    samp[:, 1] = samp[:, 1] / (h / 2.0) - 1.0
    out = F.grid_sample(dt, samp[None, None], mode="bilinear", align_corners=False)
    out = out[0, :, 0].permute(1, 0).numpy()
    out = out / np.linalg.norm(out, axis=1, keepdims=True)
    np.testing.assert_allclose(ours, out, atol=1e-5)


def test_extract_keypoints_semantics(rng):
    b, h, w = 2, 64, 96
    heat = rng.random((b, h, w)).astype(np.float32) * 0.01
    # Plant some strong peaks.
    peaks = [(10, 12, 0.9), (30, 50, 0.8), (2, 2, 0.95)]  # last is in border zone
    for y, x, v in peaks:
        heat[0, y, x] = v
    desc = rng.random((b, h // 4, w // 4, 16)).astype(np.float32)

    kp = extract_keypoints(
        jnp.array(heat), jnp.array(desc), max_keypoints=128, conf_threshold=0.05
    )
    xy = np.array(kp.xy[0])
    scores = np.array(kp.scores[0])
    valid = np.array(kp.valid[0])
    got = {(int(x), int(y)) for (x, y), v in zip(xy, valid) if v}
    assert (12, 10) in got and (50, 30) in got
    assert (2, 2) not in got  # border-removed
    # Scores sorted descending among valid.
    vs = scores[valid]
    assert np.all(np.diff(vs) <= 1e-6)
    # Descriptors are unit norm for valid entries.
    d = np.array(kp.descriptors[0])[valid]
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_extract_keypoints_stability_scaling(rng):
    b, h, w = 1, 32, 32
    heat = np.zeros((b, h, w), np.float32)
    heat[0, 10, 10] = 0.5
    heat[0, 20, 20] = 0.4
    stab = np.ones((b, h, w), np.float32)
    stab[0, 10, 10] = 0.1  # suppressed below conf_th * ...
    desc = rng.random((b, 8, 8, 4)).astype(np.float32)
    kp = extract_keypoints(
        jnp.array(heat),
        jnp.array(desc),
        jnp.array(stab),
        max_keypoints=16,
        conf_threshold=0.06,
    )
    xy = np.array(kp.xy[0])
    valid = np.array(kp.valid[0])
    got = {(int(x), int(y)) for (x, y), v in zip(xy, valid) if v}
    assert (20, 20) in got and (10, 10) not in got


def test_grouped_conv_coarse_tiling_matches_native():
    """GroupedConvAsDense (MXU-coarsened block-diagonal form) must equal
    the native feature_group_count=G conv bit-for-bit in structure and to
    f32 tolerance in value, for both the aligned (C=256) and fallback
    (C=192) paths."""
    import jax
    import jax.numpy as jnp
    from sfd2_tpu.models.layers import GroupedConvAsDense

    for feats in (256, 192):
        groups = 32
        gi = feats // groups
        m = GroupedConvAsDense(feats, groups)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, feats))
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        kern = variables["params"]["kernel"]
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_extract_small_image_large_k():
    """max_keypoints greater than the 4x4-cell count must fall back to
    the flat top_k (regression: 192x256 @ k=4096 crashed)."""
    import jax
    import jax.numpy as jnp
    from sfd2_tpu.ops.extract import extract_keypoints

    h, w, k = 192, 256, 4096
    heat = jax.nn.sigmoid(jax.random.normal(jax.random.PRNGKey(0), (1, h, w)))
    desc = jax.random.normal(jax.random.PRNGKey(1), (1, h // 4, w // 4, 32))
    out = extract_keypoints(heat, desc, None, max_keypoints=k,
                            conf_threshold=0.001)
    assert out.xy.shape == (1, k, 2)
    assert int(out.valid.sum()) > 0
