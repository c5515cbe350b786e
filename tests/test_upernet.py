"""UPerNet segmentor vs a torch twin built from the mmseg layer spec.

The twin mirrors mmseg's ``EncoderDecoder(mmcls.ConvNeXt, UPerHead,
FCNHead)`` with the exact state-dict key layout
(``decode_head.psp_modules.N.1``, ``lateral_convs.N`` …) so
``convert_upernet`` is exercised end to end on random weights — the
repo's standard golden pattern (the shipped mmseg checkpoint is not in
the sandbox)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

import sfd2_tpu.models.convnext as cn
from sfd2_tpu.models.upernet import (
    ConvNeXtUPerNet,
    Segmentor,
    SegmentorConfig,
    adaptive_avg_pool,
    convert_upernet,
)


class TorchConvModule(nn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchBackboneTiny(nn.Module):
    """4-stage mini mmcls ConvNeXt (depths all 1)."""

    def __init__(self, chans=(8, 16, 32, 64)):
        super().__init__()
        from tests.test_convnext import TorchBlock

        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(
            nn.Sequential(
                nn.Conv2d(3, chans[0], 4, 4), nn.LayerNorm(chans[0], eps=1e-5)
            )
        )
        for i in range(1, 4):
            self.downsample_layers.append(
                nn.Sequential(
                    nn.LayerNorm(chans[i - 1], eps=1e-5),
                    nn.Conv2d(chans[i - 1], chans[i], 2, 2),
                )
            )
        self.stages = nn.ModuleList(
            [nn.Sequential(TorchBlock(c)) for c in chans]
        )
        for i, c in enumerate(chans):
            setattr(self, f"norm{i}", nn.LayerNorm(c, eps=1e-5))

    def forward(self, x):
        outs = []
        for i in range(4):
            if i == 0:
                x = self.downsample_layers[0][0](x)
                x = self.downsample_layers[0][1](
                    x.permute(0, 2, 3, 1)
                ).permute(0, 3, 1, 2)
            else:
                x = self.downsample_layers[i][0](
                    x.permute(0, 2, 3, 1)
                ).permute(0, 3, 1, 2)
                x = self.downsample_layers[i][1](x)
            x = self.stages[i](x)
            norm = getattr(self, f"norm{i}")
            outs.append(
                norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            )
        return outs


class TorchUPerHead(nn.Module):
    def __init__(self, in_chs=(8, 16, 32, 64), ch=16, classes=7,
                 scales=(1, 2, 3, 6)):
        super().__init__()
        self.scales = scales
        self.psp_modules = nn.ModuleList(
            [
                nn.Sequential(
                    nn.AdaptiveAvgPool2d(s), TorchConvModule(in_chs[-1], ch, 1)
                )
                for s in scales
            ]
        )
        self.bottleneck = TorchConvModule(in_chs[-1] + len(scales) * ch, ch, 3)
        self.lateral_convs = nn.ModuleList(
            [TorchConvModule(c, ch, 1) for c in in_chs[:-1]]
        )
        self.fpn_convs = nn.ModuleList(
            [TorchConvModule(ch, ch, 3) for _ in in_chs[:-1]]
        )
        self.fpn_bottleneck = TorchConvModule(len(in_chs) * ch, ch, 3)
        self.conv_seg = nn.Conv2d(ch, classes, 1)

    def forward(self, feats):
        x3 = feats[-1]
        psp_outs = [x3] + [
            F.interpolate(m(x3), size=x3.shape[2:], mode="bilinear",
                          align_corners=False)
            for m in self.psp_modules
        ]
        psp = self.bottleneck(torch.cat(psp_outs, dim=1))
        laterals = [m(feats[i]) for i, m in enumerate(self.lateral_convs)]
        laterals.append(psp)
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="bilinear",
                align_corners=False,
            )
        fpn = [m(laterals[i]) for i, m in enumerate(self.fpn_convs)]
        fpn.append(laterals[-1])
        fpn = [fpn[0]] + [
            F.interpolate(f, size=fpn[0].shape[2:], mode="bilinear",
                          align_corners=False)
            for f in fpn[1:]
        ]
        return self.conv_seg(self.fpn_bottleneck(torch.cat(fpn, dim=1)))


class TorchFCNHead(nn.Module):
    def __init__(self, cin=32, ch=12, classes=7):
        super().__init__()
        self.convs = nn.Sequential(TorchConvModule(cin, ch, 3))
        self.conv_seg = nn.Conv2d(ch, classes, 1)

    def forward(self, x):
        return self.conv_seg(self.convs(x))


class TorchSegTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchBackboneTiny()
        self.decode_head = TorchUPerHead()
        self.auxiliary_head = TorchFCNHead()

    def forward(self, x):
        feats = self.backbone(x)
        return self.decode_head(feats), self.auxiliary_head(feats[2])


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def test_upernet_matches_torch_twin():
    torch.manual_seed(0)
    tm = TorchSegTwin()
    _randomize_bn(tm)
    tm.eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        t_logits, t_aux = tm(x)

    cn.ARCH_SETTINGS["_testseg"] = {
        "depths": (1, 1, 1, 1), "channels": (8, 16, 32, 64),
    }
    variables = convert_upernet(tm.state_dict(), arch="_testseg")
    model = ConvNeXtUPerNet(
        arch="_testseg", num_classes=7, head_channels=16, aux_channels=12
    )
    logits, aux = model.apply(
        variables, jnp.array(x.permute(0, 2, 3, 1).numpy()), with_aux=True
    )
    np.testing.assert_allclose(
        np.array(logits[0]), t_logits[0].permute(1, 2, 0).numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.array(aux[0]), t_aux[0].permute(1, 2, 0).numpy(), atol=5e-4
    )


def test_adaptive_avg_pool_matches_torch():
    rng = np.random.RandomState(0)
    for h, w, out in [(7, 9, 3), (2, 2, 6), (32, 32, 1), (10, 6, 6)]:
        x = rng.rand(2, h, w, 5).astype(np.float32)
        ours = np.array(adaptive_avg_pool(jnp.array(x), out))
        theirs = (
            F.adaptive_avg_pool2d(
                torch.from_numpy(x).permute(0, 3, 1, 2), out
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_segmentor_evaluate_contract():
    """SegNet.evaluate parity: image → 0-based int label map [H, W]."""
    cn.ARCH_SETTINGS["_testseg"] = {
        "depths": (1, 1, 1, 1), "channels": (8, 16, 32, 64),
    }
    model = ConvNeXtUPerNet(
        arch="_testseg", num_classes=9, head_channels=16, aux_channels=12
    )
    img = (np.random.RandomState(1).rand(100, 140, 3) * 255).astype(np.uint8)
    for mode in ("whole", "slide"):
        seg = Segmentor(
            config=SegmentorConfig(crop=64, stride=48, mode=mode, bf16=False),
            model=model,
        )
        labels = seg.evaluate(img)
        assert labels.shape == (100, 140)
        assert labels.dtype == np.int32
        assert labels.min() >= 0 and labels.max() < 9
