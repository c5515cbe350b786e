"""DIR (ResNet-GeM global retrieval) vs a torch twin + whitening checks.

Parity target: ``hloc/extractors/dir.py`` (Resnet-101-AP-GeM wrapper:
backbone → GeM(p=3) → whitening FC → L2; optional PCA power-whitening).
Twin built inside the test with random weights — the repo's golden
pattern.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from sfd2_tpu.models.retrieval import (
    ResNetGeM,
    convert_dir_resnet,
    gem_pool,
    pca_whiten,
)

DEPTHS = (1, 1, 1, 1)  # depth-parametric twin; (3,4,23,3) = ResNet-101


class _TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNetGeM(nn.Module):
    def __init__(self, depths=DEPTHS, out_dim=2048, p=3.0):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes, planes = 64, 64
        for li, depth in enumerate(depths):
            stride = 1 if li == 0 else 2
            blocks = []
            for bi in range(depth):
                s = stride if bi == 0 else 1
                down = None
                if bi == 0:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                blocks.append(_TorchBottleneck(inplanes, planes, s, down))
                inplanes = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
            planes *= 2
        self.whiten = nn.Linear(inplanes, out_dim)
        self.p = p

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        x = x.clamp(min=1e-6).pow(self.p).mean(dim=(2, 3)).pow(1.0 / self.p)
        x = self.whiten(x)
        return x / x.norm(dim=-1, keepdim=True).clamp(min=1e-12)


def _randomize_bn(m):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            with torch.no_grad():
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.3, 0.3)


def test_dir_resnet_gem_matches_torch_twin():
    torch.manual_seed(0)
    tm = _TorchResNetGeM().eval()
    _randomize_bn(tm)
    x = torch.randn(2, 3, 64, 80)
    with torch.no_grad():
        t_out = tm(x).numpy()

    variables = convert_dir_resnet(tm.state_dict(), depths=DEPTHS)
    model = ResNetGeM(depths=DEPTHS)
    out = np.asarray(model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(out, t_out, atol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_gem_pool_limits():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 4, 3).astype(np.float32))
    # p=1 is plain average pooling.
    np.testing.assert_allclose(
        np.asarray(gem_pool(x, p=1.0)), np.asarray(x.mean(axis=(1, 2))), rtol=1e-5
    )
    # Large p approaches max pooling.
    np.testing.assert_allclose(
        np.asarray(gem_pool(x, p=100.0)), np.asarray(x.max(axis=(1, 2))), atol=0.05
    )


def test_pca_whiten_behaviour():
    rng = np.random.RandomState(1)
    d = rng.randn(8, 16).astype(np.float32)
    mean = d.mean(0)
    # Orthonormal basis from SVD of the centered data.
    _, s, vt = np.linalg.svd(d - mean, full_matrices=False)
    var = (s**2) / (len(d) - 1)
    out = pca_whiten(d, mean, vt, var, whitenp=0.25, whitenv=None, whitenm=1.0)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # Truncation keeps the leading dims only.
    out4 = pca_whiten(d, mean, vt, var, whitenv=4)
    assert out4.shape == (8, 4)
    # Power-law scaling: whitenp=0 leaves the projection unscaled (up to norm).
    raw = (d - mean) @ vt.T
    out0 = pca_whiten(d, mean, vt, var, whitenp=0.0)
    np.testing.assert_allclose(
        out0, raw / np.linalg.norm(raw, axis=1, keepdims=True), atol=1e-5
    )


def test_dir_registry_and_global_cli(tmp_path, monkeypatch):
    import cv2

    from sfd2_tpu.cli import extract_global
    from sfd2_tpu.pipeline import extractors as ex
    from sfd2_tpu.sfm.pairs import pairs_from_retrieval

    small = lambda cfg=None, **kw: ex.make_dir(depths=DEPTHS, **kw)
    monkeypatch.setitem(ex.GLOBAL_EXTRACTOR_REGISTRY, "dir", small)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for n in ("a.png", "b.png"):
        cv2.imwrite(str(img_dir / n), rng.randint(0, 255, (48, 64, 3), np.uint8))
    out = tmp_path / "glob.npz"
    extract_global.main([
        "--image_dir", str(img_dir), "--output", str(out), "--resize_max", "64",
    ])
    data = np.load(out, allow_pickle=True)
    assert list(data["names"]) == ["a.png", "b.png"]
    assert data["descriptors"].shape == (2, 2048)
    np.testing.assert_allclose(
        np.linalg.norm(data["descriptors"], axis=1), 1.0, atol=1e-4
    )
    pairs = pairs_from_retrieval(
        ["a.png"], data["descriptors"][:1], list(data["names"]),
        data["descriptors"], num_matched=1,
    )
    assert pairs == [("a.png", "b.png")]  # self-match excluded
