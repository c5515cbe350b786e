"""Baseline extractor architectures: D2-Net, CAPS ResUNet, SGD2 nets.

Capability parity:
* ``hloc/extractors/d2net.py`` — D2-Net's VGG16-conv4_3 dense feature
  extractor (two stride-2 pools, stride-1 avg pool3, dilated conv4 block;
  output stride 4) with the hard-detection test path (channel-wise max ∧
  3×3 spatial local max ∧ Hessian edge filter). The reference imports it
  from third_party/d2net (not vendored there either); the architecture is
  re-implemented from its public definition.
* ``hloc/extractors/caps.py:215-379`` — CAPSNet's ResUNet: torchvision
  ResNet-50 encoder (conv1 + layer1-3), coarse 128-D head at 1/16, U-Net
  decoder (bilinear-upsample convs + skip concats) with fine 128-D head
  at 1/4; descriptors = concat(coarse, fine) sampled at detected
  keypoints (``:421-424``).
* ``hloc/extractors/sgd2.py:89-166`` (SPD2L2Net: single dilated VGG-ish
  trunk, full resolution, sigmoid score head + L2-normalised descriptor
  head) and ``:293-400`` (L2SegNetNB: staged conv1..conv6 variant used by
  the Sgd2 wrapper ``:850``). Both keep the reference's
  BatchNorm(affine=False) and exact kernel/dilation/padding schedule.

All NHWC/Flax with explicit torch-parity padding; converters in
``convert_baselines.py`` map torch state-dicts onto these modules, and
torch-twin golden tests live in ``tests/test_baseline_models.py``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sfd2_tpu.models.layers import BN_EPS, BN_MOMENTUM


def _conv(x, features, kernel, stride=1, padding=0, dilation=1, name=None,
          use_bias=True):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        name=name,
    )(x)


class _BN(nn.Module):
    """Torch-parity BatchNorm; `affine` mirrors nn.BatchNorm2d(affine=…)."""

    affine: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            use_scale=self.affine,
            use_bias=self.affine,
            epsilon=BN_EPS,
            momentum=BN_MOMENTUM,
            name="bn",
        )(x)


# ---------------------------------------------------------------------------
# D2-Net
# ---------------------------------------------------------------------------


class D2NetDense(nn.Module):
    """VGG16 → conv4_3 dense features (public D2-Net test architecture;
    output stride 4, 512 channels). `use_relu` appends the final ReLU
    (reference conf ``d2net.py:18``)."""

    use_relu: bool = True

    @nn.compact
    def __call__(self, x):
        # conv1_1..conv1_2 + pool1 (stride 2)
        x = nn.relu(_conv(x, 64, 3, padding=1, name="conv1_1"))
        x = nn.relu(_conv(x, 64, 3, padding=1, name="conv1_2"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # conv2 + pool2 (stride 2)
        x = nn.relu(_conv(x, 128, 3, padding=1, name="conv2_1"))
        x = nn.relu(_conv(x, 128, 3, padding=1, name="conv2_2"))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # conv3 + avg pool3 (stride 1 → keeps 1/4 res)
        x = nn.relu(_conv(x, 256, 3, padding=1, name="conv3_1"))
        x = nn.relu(_conv(x, 256, 3, padding=1, name="conv3_2"))
        x = nn.relu(_conv(x, 256, 3, padding=1, name="conv3_3"))
        # torch AvgPool2d(2, stride=1) has no padding → shrinks by 1 px.
        x = nn.avg_pool(x, (2, 2), strides=(1, 1))
        # dilated conv4 block
        x = nn.relu(_conv(x, 512, 3, padding=2, dilation=2, name="conv4_1"))
        x = nn.relu(_conv(x, 512, 3, padding=2, dilation=2, name="conv4_2"))
        x = _conv(x, 512, 3, padding=2, dilation=2, name="conv4_3")
        if self.use_relu:
            x = nn.relu(x)
        return x


def d2net_hard_detect(features: jax.Array, edge_threshold: float = 5.0):
    """D2-Net HardDetectionModule: a cell fires iff its value is (a) the
    channel-wise max, (b) a 3×3 spatial local max in its channel, and
    (c) not edge-like (Hessian trace²/det test, threshold r=5).

    Args: features [B, h, w, C]. Returns (mask [B,h,w] bool,
    score [B,h,w] = channel-max value where detected else 0).
    """
    b, h, w, c = features.shape
    depth_max = jnp.max(features, axis=-1)
    is_depth_max = features >= depth_max[..., None]

    # 3×3 local max per channel.
    local_max = jax.lax.reduce_window(
        features, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    is_local_max = features >= local_max

    # Hessian of the channel-max map via the reference's fixed stencils.
    f = depth_max
    pad = jnp.pad(f, ((0, 0), (1, 1), (1, 1)), mode="edge")
    dii = pad[:, :-2, 1:-1] - 2 * f + pad[:, 2:, 1:-1]
    djj = pad[:, 1:-1, :-2] - 2 * f + pad[:, 1:-1, 2:]
    dij = 0.25 * (
        pad[:, 2:, 2:] + pad[:, :-2, :-2] - pad[:, 2:, :-2] - pad[:, :-2, 2:]
    )
    det = dii * djj - dij * dij
    tr = dii + djj
    r = edge_threshold
    not_edge = (det > 0) & (tr * tr / jnp.where(det == 0, 1e-12, det)
                            <= (r + 1) ** 2 / r)

    fired = jnp.any(is_depth_max & is_local_max, axis=-1) & not_edge
    return fired, jnp.where(fired, depth_max, 0.0)


# ---------------------------------------------------------------------------
# CAPS ResUNet (ResNet-50 encoder)
# ---------------------------------------------------------------------------


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck (1×1 → 3×3 → 1×1·4, affine BN)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(x, self.planes, 1, name="conv1", use_bias=False)
        out = _BN(name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(out, self.planes, 3, stride=self.stride, padding=1,
                    name="conv2", use_bias=False)
        out = _BN(name="bn2")(out, train)
        out = nn.relu(out)
        out = _conv(out, self.planes * 4, 1, name="conv3", use_bias=False)
        out = _BN(name="bn3")(out, train)
        if self.downsample:
            identity = _conv(x, self.planes * 4, 1, stride=self.stride,
                             name="down_conv", use_bias=False)
            identity = _BN(name="down_bn")(identity, train)
        return nn.relu(out + identity)


class _CapsConv(nn.Module):
    """CAPS `conv` block: Conv → BN(affine) → ELU (``caps.py:287-299``)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = _conv(x, self.features, self.kernel, stride=self.stride,
                  padding=p, name="conv")
        x = _BN(name="bnm")(x, train)
        return nn.elu(x)


def _upsample2(x):
    """Bilinear ×2 with align_corners=True (``caps.py:305``)."""
    from sfd2_tpu.ops.resize import resize_bilinear

    return resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]),
                           align_corners=True)


class CapsResUNet(nn.Module):
    """ResUNet (``caps.py:300-379``): ResNet-50 layers 1-3 encoder, coarse
    128-D head at 1/16, U-Net decoder with skip concats, fine 128-D head
    at 1/4. Returns (coarse, fine)."""

    coarse_dim: int = 128
    fine_dim: int = 128
    layers: Tuple[int, int, int] = (3, 4, 6)  # resnet50 layer1..3

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Stem: 7×7/2 conv + BN + relu + 3×3/2 max pool.
        x = _conv(x, 64, 7, stride=2, padding=3, name="firstconv",
                  use_bias=False)
        x = _BN(name="firstbn")(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        def layer(x, planes, blocks, stride, name):
            for i in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    name=f"{name}_{i}",
                )(x, train)
            return x

        x1 = layer(x, 64, self.layers[0], 1, "layer1")   # 1/4, 256
        x2 = layer(x1, 128, self.layers[1], 2, "layer2")  # 1/8, 512
        x3 = layer(x2, 256, self.layers[2], 2, "layer3")  # 1/16, 1024

        coarse = _CapsConv(self.coarse_dim, 1, name="conv_coarse")(x3, train)

        def skip(up, enc):
            dh = enc.shape[1] - up.shape[1]
            dw = enc.shape[2] - up.shape[2]
            up = jnp.pad(
                up,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
            return jnp.concatenate([enc, up], axis=-1)

        y = _CapsConv(512, 3, name="upconv3")(_upsample2(x3), train)
        y = _CapsConv(512, 3, name="iconv3")(skip(y, x2), train)
        y = _CapsConv(256, 3, name="upconv2")(_upsample2(y), train)
        y = _CapsConv(256, 3, name="iconv2")(skip(y, x1), train)
        fine = _CapsConv(self.fine_dim, 1, name="conv_fine")(y, train)
        return coarse, fine


def caps_sample_descriptors(coarse, fine, xy, image_hw):
    """Sample concat(coarse, fine) at pixel keypoints (CAPSNet
    ``sample_feat_by_coord`` + the Caps wrapper concat, ``caps.py:421-424``).
    Normalised coords use c=(dim−1)/2 and grid_sample align_corners=False.
    coarse/fine: [h, w, C] maps; xy: [N, 2]; image_hw: full-res (H, W)."""
    from sfd2_tpu.ops.grid_sample import sample_at_points

    h_img, w_img = image_hw
    out = []
    for fmap in (coarse, fine):
        h, w = fmap.shape[0], fmap.shape[1]
        cx = (xy[:, 0] - (w_img - 1) / 2) / ((w_img - 1) / 2)  # [-1, 1]
        cy = (xy[:, 1] - (h_img - 1) / 2) / ((h_img - 1) / 2)
        # align_corners=False: x_pix = ((x_n + 1) * w − 1) / 2
        px = ((cx + 1) * w - 1) / 2
        py = ((cy + 1) * h - 1) / 2
        out.append(sample_at_points(fmap, jnp.stack([px, py], -1),
                                    padding_mode="edge"))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# SGD2 prototypes
# ---------------------------------------------------------------------------


class _SgdConvBNRelu(nn.Module):
    """Conv → BN(affine=False) [→ ReLU] with explicit dilation/padding."""

    features: int
    kernel: int = 3
    padding: int = 1
    dilation: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _conv(x, self.features, self.kernel, padding=self.padding,
                  dilation=self.dilation, name="conv")
        x = _BN(affine=False, name="bnm")(x, train)
        return nn.relu(x) if self.relu else x


class SPD2L2Net(nn.Module):
    """``sgd2.py:89`` — single dilated trunk at full resolution; heads:
    sigmoid score (convPb) + L2-normalised `outdim` descriptors (convDb)."""

    outdim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (features, kernel, padding, dilation, relu) — trunk schedule
        # exactly as the torch Sequential (conv1.0 .. conv1.34).
        plan = [
            (16, 3, 1, 1, True), (16, 3, 1, 1, True),
            (32, 3, 1, 1, True), (32, 3, 1, 1, True),
            (64, 3, 1, 1, True), (64, 3, 2, 2, True),
            (128, 3, 2, 2, True), (128, 3, 4, 4, True),
            (128, 2, 2, 4, False), (128, 2, 4, 8, False),
        ]
        for i, (f, k, p, d, r) in enumerate(plan):
            x = _SgdConvBNRelu(f, k, p, d, relu=r, name=f"unit{i}")(x, train)
        # Final kernel-2 dilated conv WITHOUT BN (trunk tail, ``:123``).
        x = _conv(x, 128, 2, padding=8, dilation=16, name="tail")
        score = jax.nn.sigmoid(_conv(x, 1, 1, name="convPb"))[..., 0]
        desc = _conv(x, self.outdim, 1, name="convDb")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        return score, desc


class L2SegNetNB(nn.Module):
    """``sgd2.py:293`` — staged conv1..conv6 variant (the net the Sgd2
    wrapper instantiates, ``:861``); `require_feature` also returns the
    stage-1..3 feature maps."""

    outdim: int = 128
    require_feature: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def stage(x, specs, name):
            for i, (f, k, p, d, r) in enumerate(specs):
                x = _SgdConvBNRelu(f, k, p, d, relu=r, name=f"{name}_{i}")(
                    x, train
                )
            return x

        out1 = stage(x, [(16, 3, 1, 1, True), (16, 3, 1, 1, True)], "conv1")
        out2 = stage(out1, [(24, 3, 1, 1, True), (24, 3, 1, 1, True)], "conv2")
        out3 = stage(out2, [(32, 3, 1, 1, True), (32, 3, 1, 1, True)], "conv3")
        out4 = stage(out3, [(64, 3, 1, 1, True), (64, 3, 2, 2, True)], "conv4")
        out5 = stage(out4, [(128, 3, 2, 2, True), (128, 3, 4, 4, True)], "conv5")
        out6 = stage(
            out5,
            [(128, 2, 2, 4, False), (128, 2, 4, 8, False)],
            "conv6",
        )
        out6 = _conv(out6, 128, 2, padding=8, dilation=16, name="conv6_tail")
        score = jax.nn.sigmoid(_conv(out6, 1, 1, name="convPb"))[..., 0]
        desc = _conv(out6, self.outdim, 1, name="convDb")
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
        )
        if self.require_feature:
            return score, desc, (out1, out2, out3)
        return score, desc
