"""Golden tests: Flax ResSegNetV2 + converter vs a torch twin.

The torch twin is built here from the published SFD2 architecture spec
(layer table in sfd2_tpu/models/sfd2.py docstring) with the reference's
state-dict key layout, randomly initialised — so converting its weights
and comparing forwards validates conv padding, BN semantics, exp-normalise
softmax, pixel shuffle, stability mapping and the OIHW→HWIO conversion in
one shot.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.models.superpoint import SuperPoint, convert_superpoint
from sfd2_tpu.models.convert import convert_ressegnet


def _conv(cin, cout, k=3, stride=1, relu=True, use_bn=True):
    layers = [nn.Conv2d(cin, cout, k, stride, padding=1)]
    if use_bn:
        layers.append(nn.BatchNorm2d(cout, affine=False))
    if relu:
        layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class TorchResBlock(nn.Module):
    def __init__(self, planes, groups=32):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + x)


class TorchResSegNetV2(nn.Module):
    """Torch twin with the reference checkpoint key layout."""

    def __init__(self, outdim=128):
        super().__init__()
        self.conv1a = _conv(3, 64)
        self.conv1b = _conv(64, 64, stride=2, relu=False, use_bn=False)
        self.bn1b = nn.Sequential(nn.BatchNorm2d(64, affine=False))
        self.conv2a = _conv(64, 128)
        self.conv2b = _conv(128, 128, stride=2, relu=False, use_bn=False)
        self.bn2b = nn.Sequential(nn.BatchNorm2d(128, affine=False))
        self.conv3a = _conv(128, 256)
        self.conv3b = _conv(256, 256, relu=False, use_bn=False)
        self.bn3b = nn.Sequential(nn.BatchNorm2d(256, affine=False))
        self.conv4 = nn.Sequential(*[TorchResBlock(256) for _ in range(3)])
        self.convPa = nn.Sequential(
            nn.Conv2d(256, 256, 3, 2, 1),
            nn.BatchNorm2d(256),
            nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1),
        )
        self.convDa = nn.Sequential(
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.BatchNorm2d(256),
            nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1),
        )
        self.convPb = nn.Conv2d(256, 65, 1)
        self.convDb = nn.Conv2d(256, outdim, 1)
        self.ConvSta = nn.Conv2d(256, 3, 1)

    def forward(self, x):
        o = self.bn1b(self.conv1b(self.conv1a(x)))
        o = F.relu(o)
        o = self.bn2b(self.conv2b(self.conv2a(o)))
        o = F.relu(o)
        o = self.bn3b(self.conv3b(self.conv3a(o)))
        o = F.relu(o)
        out4 = self.conv4(o)

        semi = self.convPb(self.convPa(out4))
        semi = torch.exp(semi)
        semi_norm = semi / (torch.sum(semi, dim=1, keepdim=True) + 1e-5)
        score = semi_norm[:, :-1]
        b, _, hc, wc = score.shape
        score = score.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
        score = score.permute(0, 1, 3, 2, 4).reshape(b, 1, hc * 8, wc * 8)

        desc = self.convDb(self.convDa(out4))
        desc = F.normalize(desc, dim=1)

        sta = self.ConvSta(out4)
        sta = F.interpolate(sta, size=(x.shape[2], x.shape[3]), mode="bilinear")
        cls = torch.max(sta, dim=1, keepdim=True)[1]
        stab = torch.ones_like(cls).float()
        stab[cls == 0] = 0.1
        stab[cls == 1] = 0.5
        return score, stab, desc


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


def test_ressegnetv2_matches_torch_twin():
    gen = torch.Generator().manual_seed(0)
    tm = TorchResSegNetV2()
    with torch.no_grad():
        _randomize_bn_stats(tm, gen)
    tm.eval()

    x = torch.randn(1, 3, 64, 96, generator=gen)
    with torch.no_grad():
        t_score, t_stab, t_desc = tm(x)

    variables = convert_ressegnet(tm.state_dict())
    model = ResSegNetV2(require_stability=True)
    out = model.apply(variables, jnp.array(x.permute(0, 2, 3, 1).numpy()))

    np.testing.assert_allclose(
        np.array(out.score), t_score[:, 0].numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.array(out.descriptors),
        t_desc.permute(0, 2, 3, 1).numpy(),
        atol=2e-5,
    )
    # Stability: argmax can flip on near-ties after float reordering; demand
    # 99.9% agreement.
    agree = (np.array(out.stability) == t_stab[:, 0].numpy()).mean()
    assert agree > 0.999, agree


def test_ressegnetv2_training_outputs_shapes():
    import jax

    model = ResSegNetV2(require_stability=True, require_feature=True)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, training_outputs=True)
    assert out.semi.shape == (2, 8, 8, 65)
    assert out.stability_logits.shape == (2, 64, 64, 3)
    assert len(out.features) == 2
    assert out.features[0].shape == (2, 16, 16, 128)
    assert out.features[1].shape == (2, 16, 16, 256)
    # det_train folds stability into the score (nets/sfd2.py:393).
    vals = np.unique(np.array(out.stability))
    assert all(min(abs(v - t) for t in (0.1, 0.5, 1.0)) < 1e-6 for v in vals)


class TorchSuperPoint(nn.Module):
    def __init__(self):
        super().__init__()
        for name, (cin, cout) in {
            "conv1a": (1, 64), "conv1b": (64, 64),
            "conv2a": (64, 64), "conv2b": (64, 64),
            "conv3a": (64, 128), "conv3b": (128, 128),
            "conv4a": (128, 128), "conv4b": (128, 128),
            "convPa": (128, 256), "convDa": (128, 256),
        }.items():
            setattr(self, name, nn.Conv2d(cin, cout, 3, 1, 1))
        self.convPb = nn.Conv2d(256, 65, 1)
        self.convDb = nn.Conv2d(256, 256, 1)

    def forward(self, x):
        pool = lambda v: F.max_pool2d(v, 2, 2)
        x = F.relu(self.conv1b(F.relu(self.conv1a(x))))
        x = pool(x)
        x = F.relu(self.conv2b(F.relu(self.conv2a(x))))
        x = pool(x)
        x = F.relu(self.conv3b(F.relu(self.conv3a(x))))
        x = pool(x)
        x = F.relu(self.conv4b(F.relu(self.conv4a(x))))
        semi = self.convPb(F.relu(self.convPa(x)))
        semi = torch.exp(semi)
        semi_norm = semi / (torch.sum(semi, dim=1, keepdim=True) + 1e-5)
        s = semi_norm[:, :-1]
        b, _, hc, wc = s.shape
        s = s.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
        score = s.permute(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)
        desc = self.convDb(F.relu(self.convDa(x)))
        desc = F.normalize(desc, dim=1)
        return score, semi_norm, desc


def test_superpoint_matches_torch_twin():
    torch.manual_seed(1)
    tm = TorchSuperPoint().eval()
    x = torch.rand(1, 1, 64, 80)
    with torch.no_grad():
        t_score, t_semi, t_desc = tm(x)

    variables = convert_superpoint(tm.state_dict())
    out = SuperPoint().apply(variables, jnp.array(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.array(out["scores"]), t_score.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.array(out["semi_norm"]), t_semi.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(out["descs"]), t_desc.permute(0, 2, 3, 1).numpy(), atol=1e-5
    )
