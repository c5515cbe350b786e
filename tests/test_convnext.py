"""Flax ConvNeXt vs a torch twin built from the published block spec."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from sfd2_tpu.models.convnext import ConvNeXt, convert_convnext


class TorchBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.depthwise_conv = nn.Conv2d(ch, ch, 7, padding=3, groups=ch)
        self.norm = nn.LayerNorm(ch, eps=1e-5)
        self.pointwise_conv1 = nn.Linear(ch, 4 * ch)
        self.pointwise_conv2 = nn.Linear(4 * ch, ch)
        self.gamma = nn.Parameter(torch.ones(ch))

    def forward(self, x):
        s = x
        x = self.depthwise_conv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pointwise_conv2(F.gelu(self.pointwise_conv1(x)))
        x = x * self.gamma
        return s + x.permute(0, 3, 1, 2)


class TorchTiny(nn.Module):
    """2-stage mini ConvNeXt with the reference key layout."""

    def __init__(self, chans=(8, 16), depths=(2, 2)):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        stem = nn.Sequential(nn.Conv2d(3, chans[0], 4, 4), nn.LayerNorm(chans[0], eps=1e-5))
        self.downsample_layers.append(stem)
        self.downsample_layers.append(
            nn.Sequential(nn.LayerNorm(chans[0], eps=1e-5), nn.Conv2d(chans[0], chans[1], 2, 2))
        )
        self.stages = nn.ModuleList(
            [nn.Sequential(*[TorchBlock(c) for _ in range(d)]) for c, d in zip(chans, depths)]
        )
        self.norm0 = nn.LayerNorm(chans[0], eps=1e-5)
        self.norm1 = nn.LayerNorm(chans[1], eps=1e-5)

    def forward(self, x):
        outs = []
        for i, stage in enumerate(self.stages):
            if i == 0:
                x = self.downsample_layers[0][0](x)
                x = self.downsample_layers[0][1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            else:
                x = self.downsample_layers[1][0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = self.downsample_layers[1][1](x)
            x = stage(x)
            norm = getattr(self, f"norm{i}")
            outs.append(norm(x.permute(0, 2, 3, 1)))
        return outs


def test_convnext_matches_torch_twin():
    torch.manual_seed(0)
    tm = TorchTiny().eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        t_outs = tm(x)

    import sfd2_tpu.models.convnext as cn

    cn.ARCH_SETTINGS["_test"] = {"depths": (2, 2), "channels": (8, 16)}
    variables = convert_convnext(tm.state_dict(), arch="_test")
    model = ConvNeXt(arch="_test", out_indices=(0, 1))
    outs = model.apply(variables, jnp.array(x.permute(0, 2, 3, 1).numpy()))
    for ours, theirs in zip(outs, t_outs):
        np.testing.assert_allclose(np.array(ours), theirs.numpy(), atol=2e-5)
