"""Baseline architectures vs torch twins built from the public specs.

Twins are constructed inside the tests (random weights) with the exact
torch module/key layout the converters expect — the repo's established
golden pattern (see tests/test_model_sfd2.py, tests/test_convnext.py).
Parity targets: ``hloc/extractors/{d2net,caps,sgd2}.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from sfd2_tpu.models.baselines import (
    CapsResUNet,
    D2NetDense,
    L2SegNetNB,
    SPD2L2Net,
    caps_sample_descriptors,
    d2net_hard_detect,
)
from sfd2_tpu.models.convert_baselines import (
    convert_caps,
    convert_d2net,
    convert_l2segnetnb,
    convert_spd2l2net,
)


def _randomize_bn(m):
    """Give BN layers non-trivial running stats so eval-mode parity is a
    real check, not an identity."""
    for mod in m.modules():
        if isinstance(mod, (nn.BatchNorm2d,)):
            with torch.no_grad():
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                if mod.affine:
                    mod.weight.uniform_(0.5, 1.5)
                    mod.bias.uniform_(-0.3, 0.3)


# ---------------------------------------------------------------------------
# D2-Net
# ---------------------------------------------------------------------------


def _torch_d2net(use_relu=True):
    layers = [
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(2, stride=2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(2, stride=2),
        nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
        nn.AvgPool2d(2, stride=1),
        nn.Conv2d(256, 512, 3, padding=2, dilation=2), nn.ReLU(inplace=True),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2), nn.ReLU(inplace=True),
        nn.Conv2d(512, 512, 3, padding=2, dilation=2),
    ]
    if use_relu:
        layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


def test_d2net_dense_matches_torch_twin():
    torch.manual_seed(0)
    tm = _torch_d2net().eval()
    x = torch.randn(1, 3, 32, 40)
    with torch.no_grad():
        t_out = tm(x).permute(0, 2, 3, 1).numpy()

    sd = {f"model.{k}": v for k, v in tm.state_dict().items()}
    variables = convert_d2net(sd)
    model = D2NetDense(use_relu=True)
    out = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    assert out.shape == t_out.shape  # incl. the AvgPool2d(2,1) shrink-by-1
    np.testing.assert_allclose(np.asarray(out), t_out, atol=3e-4)


def test_d2net_hard_detect_analytic():
    h = w = 24
    f = np.zeros((1, h, w, 4), np.float32)
    # Isolated blob on channel 2 → must fire at its center.
    f[0, 6, 6, 2] = 1.0
    f[0, 6, 5, 2] = f[0, 6, 7, 2] = f[0, 5, 6, 2] = f[0, 7, 6, 2] = 0.5
    # Straight ridge (edge-like, tr²/det huge) → must be rejected.
    f[0, 16, 4:20, 1] = 1.0
    fired, score = d2net_hard_detect(jnp.asarray(f))
    fired = np.asarray(fired)
    score = np.asarray(score)
    assert fired[0, 6, 6] and abs(score[0, 6, 6] - 1.0) < 1e-6
    assert not fired[0, 16, 6:18].any()


# ---------------------------------------------------------------------------
# CAPS
# ---------------------------------------------------------------------------


class _TorchCapsConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, (k - 1) // 2)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.elu(self.bn(self.conv(x)), inplace=True)


class _TorchUpconv(nn.Module):
    def __init__(self, cin, cout, k, scale):
        super().__init__()
        self.scale = scale
        self.conv = _TorchCapsConv(cin, cout, k)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=self.scale, align_corners=True,
                          mode="bilinear")
        return self.conv(x)


class _TorchBottleneck(nn.Module):
    """torchvision Bottleneck twin (same attribute/key layout)."""

    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = (
            nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            if downsample
            else None
        )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)), inplace=True)
        y = F.relu(self.bn2(self.conv2(y)), inplace=True)
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt, inplace=True)


def _torch_res_layer(cin, planes, blocks, stride):
    mods = [_TorchBottleneck(cin, planes, stride, downsample=True)]
    for _ in range(blocks - 1):
        mods.append(_TorchBottleneck(planes * 4, planes))
    return nn.Sequential(*mods)


class _TorchResUNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.firstconv = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.firstbn = nn.BatchNorm2d(64)
        self.firstrelu = nn.ReLU(inplace=True)
        self.firstmaxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = _torch_res_layer(64, 64, 3, 1)
        self.layer2 = _torch_res_layer(256, 128, 4, 2)
        self.layer3 = _torch_res_layer(512, 256, 6, 2)
        self.conv_coarse = _TorchCapsConv(1024, 128, 1)
        self.upconv3 = _TorchUpconv(1024, 512, 3, 2)
        self.iconv3 = _TorchCapsConv(512 + 512, 512, 3)
        self.upconv2 = _TorchUpconv(512, 256, 3, 2)
        self.iconv2 = _TorchCapsConv(256 + 256, 256, 3)
        self.conv_fine = _TorchCapsConv(256, 128, 1)

    @staticmethod
    def _skip(up, enc):
        # Reference skipconnect pads the UPSAMPLED map and concats
        # [encoder, upsampled] (``caps.py:344-356``).
        dy = enc.size(2) - up.size(2)
        dx = enc.size(3) - up.size(3)
        up = F.pad(up, (dx // 2, dx - dx // 2, dy // 2, dy - dy // 2))
        return torch.cat([enc, up], dim=1)

    def forward(self, x):
        x = self.firstrelu(self.firstbn(self.firstconv(x)))
        x = self.firstmaxpool(x)
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        coarse = self.conv_coarse(x3)
        y = self.upconv3(x3)
        y = self.iconv3(self._skip(y, x2))
        y = self.upconv2(y)
        y = self.iconv2(self._skip(y, x1))
        fine = self.conv_fine(y)
        return coarse, fine


def test_caps_resunet_matches_torch_twin():
    torch.manual_seed(1)
    tm = _TorchResUNet()
    _randomize_bn(tm)
    tm.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        t_coarse, t_fine = tm(x)

    sd = {f"net.{k}": v for k, v in tm.state_dict().items()}
    variables = convert_caps(sd)
    model = CapsResUNet()
    coarse, fine = model.apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(
        np.asarray(coarse), t_coarse.permute(0, 2, 3, 1).numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fine), t_fine.permute(0, 2, 3, 1).numpy(), atol=2e-3
    )


def test_caps_descriptor_sampling_matches_grid_sample(rng):
    """caps_sample_descriptors == torch grid_sample(align_corners=False)
    through the CAPSNet normalize() convention."""
    h, w = 12, 16
    h_img, w_img = 48, 64
    fmap = rng.normal(size=(h, w, 8)).astype(np.float32)
    xy = np.stack(
        [rng.uniform(2, w_img - 3, 20), rng.uniform(2, h_img - 3, 20)], -1
    ).astype(np.float32)

    t_map = torch.from_numpy(fmap).permute(2, 0, 1)[None]
    c = torch.tensor([(w_img - 1) / 2.0, (h_img - 1) / 2.0])
    coord_n = (torch.from_numpy(xy) - c) / c
    t_out = (
        F.grid_sample(t_map, coord_n[None, :, None, :], align_corners=False)
        .squeeze(-1)[0].T.numpy()
    )

    ours = caps_sample_descriptors(
        jnp.asarray(fmap), jnp.asarray(fmap), jnp.asarray(xy), (h_img, w_img)
    )
    np.testing.assert_allclose(np.asarray(ours)[:, :8], t_out, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours)[:, 8:], t_out, atol=1e-5)


# ---------------------------------------------------------------------------
# SGD2
# ---------------------------------------------------------------------------


def _bnf(c):
    return nn.BatchNorm2d(c, affine=False, track_running_stats=True)


def _torch_spd2():
    trunk = nn.Sequential(
        nn.Conv2d(3, 16, 3, 1, 1), _bnf(16), nn.ReLU(True),
        nn.Conv2d(16, 16, 3, 1, 1), _bnf(16), nn.ReLU(True),
        nn.Conv2d(16, 32, 3, 1, 1), _bnf(32), nn.ReLU(True),
        nn.Conv2d(32, 32, 3, 1, 1), _bnf(32), nn.ReLU(True),
        nn.Conv2d(32, 64, 3, 1, 1), _bnf(64), nn.ReLU(True),
        nn.Conv2d(64, 64, 3, 1, 2, 2), _bnf(64), nn.ReLU(True),
        nn.Conv2d(64, 128, 3, 1, 2, 2), _bnf(128), nn.ReLU(True),
        nn.Conv2d(128, 128, 3, 1, 4, 4), _bnf(128), nn.ReLU(True),
        nn.Conv2d(128, 128, 2, 1, 2, 4), _bnf(128),
        nn.Conv2d(128, 128, 2, 1, 4, 8), _bnf(128),
        nn.Conv2d(128, 128, 2, 1, 8, 16),
    )

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = trunk
            self.convDb = nn.Conv2d(128, 128, 1)
            self.convPb = nn.Conv2d(128, 1, 1)

        def forward(self, x):
            x = self.conv1(x)
            return torch.sigmoid(self.convPb(x))[:, 0], F.normalize(
                self.convDb(x), dim=1
            )

    return M()


def test_spd2l2net_matches_torch_twin():
    torch.manual_seed(2)
    tm = _torch_spd2()
    _randomize_bn(tm)
    tm.eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        t_score, t_desc = tm(x)
    variables = convert_spd2l2net(tm.state_dict())
    score, desc = SPD2L2Net(outdim=128).apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(score), t_score.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(desc), t_desc.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )


def _torch_l2segnetnb():
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Sequential(
                nn.Conv2d(3, 16, 3, 1, 1), _bnf(16), nn.ReLU(True),
                nn.Conv2d(16, 16, 3, 1, 1), _bnf(16), nn.ReLU(True))
            self.conv2 = nn.Sequential(
                nn.Conv2d(16, 24, 3, 1, 1), _bnf(24), nn.ReLU(True),
                nn.Conv2d(24, 24, 3, 1, 1), _bnf(24), nn.ReLU(True))
            self.conv3 = nn.Sequential(
                nn.Conv2d(24, 32, 3, 1, 1), _bnf(32), nn.ReLU(True),
                nn.Conv2d(32, 32, 3, 1, 1), _bnf(32), nn.ReLU(True))
            self.conv4 = nn.Sequential(
                nn.Conv2d(32, 64, 3, 1, 1), _bnf(64), nn.ReLU(True),
                nn.Conv2d(64, 64, 3, 1, 2, 2), _bnf(64), nn.ReLU(True))
            self.conv5 = nn.Sequential(
                nn.Conv2d(64, 128, 3, 1, 2, 2), _bnf(128), nn.ReLU(True),
                nn.Conv2d(128, 128, 3, 1, 4, 4), _bnf(128), nn.ReLU(True))
            self.conv6 = nn.Sequential(
                nn.Conv2d(128, 128, 2, 1, 2, 4), _bnf(128),
                nn.Conv2d(128, 128, 2, 1, 4, 8), _bnf(128),
                nn.Conv2d(128, 128, 2, 1, 8, 16))
            self.convDb = nn.Conv2d(128, 128, 1)
            self.convPb = nn.Conv2d(128, 1, 1)

        def forward(self, x):
            o1 = self.conv1(x)
            o2 = self.conv2(o1)
            o3 = self.conv3(o2)
            x = self.conv6(self.conv5(self.conv4(o3)))
            return (
                torch.sigmoid(self.convPb(x))[:, 0],
                F.normalize(self.convDb(x), dim=1),
                (o1, o2, o3),
            )

    return M()


def test_l2segnetnb_matches_torch_twin():
    torch.manual_seed(3)
    tm = _torch_l2segnetnb()
    _randomize_bn(tm)
    tm.eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        t_score, t_desc, t_feats = tm(x)
    variables = convert_l2segnetnb(tm.state_dict())
    score, desc, feats = L2SegNetNB(outdim=128, require_feature=True).apply(
        variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(np.asarray(score), t_score.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(desc), t_desc.permute(0, 2, 3, 1).numpy(), atol=1e-4
    )
    for ours, theirs in zip(feats, t_feats):
        np.testing.assert_allclose(
            np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )
