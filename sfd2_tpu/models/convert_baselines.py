"""Torch state-dict → Flax variable converters for the baseline models.

Key layouts converted (see ``sfd2_tpu/models/baselines.py`` for the
architecture parity notes):

* D2-Net: ``dense_feature_extraction.model.{i}.weight/bias`` Sequential
  indices → named convs (conv1_1 … conv4_3).
* CAPS ResUNet: ``net.firstconv/firstbn/layer{1-3}.{i}.…`` (torchvision
  ResNet-50 naming inside CAPSNet) + decoder
  ``net.{conv_coarse,upconv3,iconv3,upconv2,iconv2,conv_fine}``.
* SGD2: ``conv1.{i}`` single-trunk (SPD2L2Net) and staged
  ``conv{1..6}.{i}`` (L2SegNetNB) Sequential indices, + convPb/convDb.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from sfd2_tpu.models.convert import _conv_kernel, _strip_prefix


def _conv_entry(sd, key, bias=True):
    e = {"kernel": _conv_kernel(sd[f"{key}.weight"])}
    if bias and f"{key}.bias" in sd:
        e["bias"] = sd[f"{key}.bias"]
    return e


def _bn_stats(sd, key):
    return {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}


def _bn_params(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


# ---------------------------------------------------------------------------


_D2NET_IDX = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
}


def convert_d2net(state: Mapping[str, Any]) -> Dict[str, Any]:
    sd = _strip_prefix(state)
    # Accept both bare Sequential dumps and the full model dump.
    pref = (
        "dense_feature_extraction.model."
        if any(k.startswith("dense_feature_extraction.") for k in sd)
        else "model." if any(k.startswith("model.") for k in sd) else ""
    )
    params = {
        name: _conv_entry(sd, f"{pref}{i}") for i, name in _D2NET_IDX.items()
    }
    return {"params": params}


# ---------------------------------------------------------------------------


def convert_caps(state: Mapping[str, Any]) -> Dict[str, Any]:
    sd = _strip_prefix(state)
    if any(k.startswith("net.net.") for k in sd):  # CAPSNet wrapper depth
        sd = {k[4:]: v for k, v in sd.items() if k.startswith("net.")}
    pref = "net." if any(k.startswith("net.") for k in sd) else ""

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["firstconv"] = _conv_entry(sd, f"{pref}firstconv", bias=False)
    params["firstbn"] = {"bn": _bn_params(sd, f"{pref}firstbn")}
    stats["firstbn"] = {"bn": _bn_stats(sd, f"{pref}firstbn")}

    blocks = {"layer1": 3, "layer2": 4, "layer3": 6}
    for lname, n in blocks.items():
        for i in range(n):
            t = f"{pref}{lname}.{i}"
            f = f"{lname}_{i}"
            p = {}
            s = {}
            for j in (1, 2, 3):
                p[f"conv{j}"] = _conv_entry(sd, f"{t}.conv{j}", bias=False)
                p[f"bn{j}"] = {"bn": _bn_params(sd, f"{t}.bn{j}")}
                s[f"bn{j}"] = {"bn": _bn_stats(sd, f"{t}.bn{j}")}
            if f"{t}.downsample.0.weight" in sd:
                p["down_conv"] = _conv_entry(sd, f"{t}.downsample.0", bias=False)
                p["down_bn"] = {"bn": _bn_params(sd, f"{t}.downsample.1")}
                s["down_bn"] = {"bn": _bn_stats(sd, f"{t}.downsample.1")}
            params[f] = p
            stats[f] = s

    def caps_conv(torch_name, flax_name, nested=False):
        # upconv wraps a conv block one level deeper (upconv3.conv.conv).
        base = f"{pref}{torch_name}" + (".conv" if nested else "")
        params[flax_name] = {
            "conv": _conv_entry(sd, f"{base}.conv"),
            "bnm": {"bn": _bn_params(sd, f"{base}.bn")},
        }
        stats[flax_name] = {"bnm": {"bn": _bn_stats(sd, f"{base}.bn")}}

    caps_conv("conv_coarse", "conv_coarse")
    caps_conv("upconv3", "upconv3", nested=True)
    caps_conv("iconv3", "iconv3")
    caps_conv("upconv2", "upconv2", nested=True)
    caps_conv("iconv2", "iconv2")
    caps_conv("conv_fine", "conv_fine")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------


def _sgd_unit(sd, conv_key, bn_key, params, stats, name):
    params[name] = {"conv": _conv_entry(sd, conv_key)}
    stats[name] = {"bnm": {"bn": _bn_stats(sd, bn_key)}}


def convert_spd2l2net(state: Mapping[str, Any]) -> Dict[str, Any]:
    sd = _strip_prefix(state)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    conv_idx = [0, 3, 6, 9, 12, 15, 18, 21, 24, 26]
    for u, ci in enumerate(conv_idx):
        _sgd_unit(sd, f"conv1.{ci}", f"conv1.{ci + 1}", params, stats,
                  f"unit{u}")
    params["tail"] = _conv_entry(sd, "conv1.28")
    params["convPb"] = _conv_entry(sd, "convPb")
    params["convDb"] = _conv_entry(sd, "convDb")
    return {"params": params, "batch_stats": stats}


def convert_l2segnetnb(state: Mapping[str, Any]) -> Dict[str, Any]:
    sd = _strip_prefix(state)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for stage in ("conv1", "conv2", "conv3", "conv4", "conv5"):
        for u, ci in enumerate((0, 3)):
            _sgd_unit(sd, f"{stage}.{ci}", f"{stage}.{ci + 1}", params, stats,
                      f"{stage}_{u}")
    for u, ci in enumerate((0, 2)):
        _sgd_unit(sd, f"conv6.{ci}", f"conv6.{ci + 1}", params, stats,
                  f"conv6_{u}")
    params["conv6_tail"] = _conv_entry(sd, "conv6.4")
    params["convPb"] = _conv_entry(sd, "convPb")
    params["convDb"] = _conv_entry(sd, "convDb")
    return {"params": params, "batch_stats": stats}
