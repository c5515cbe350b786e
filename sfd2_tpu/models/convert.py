"""Torch-checkpoint → Flax-params converter for ResSegNet[V2].

Capability parity: lets the shipped SFD2 checkpoint
(``weights/20220810_ressegnetv2_wapv2_ce_sd2mfsf_uspg.pth``, loaded by
``extract_localization.py:208`` with ``ckpt['model']`` and strict=False)
drive this framework's Flax model. Accepts either a state-dict of numpy
arrays or a ``.pth`` path (loaded via torch on CPU when available).

Key-layout mapping (torch Sequential indices → named Flax submodules):

  conv{1,2,3}{a}.0/.1     → conv*a.conv / conv*a.bn        (BN affine-free)
  conv{1,2,3}{b}.0        → conv*b.conv
  bn{1,2,3}b.0            → bn*b.bn                        (BN affine-free)
  conv4.{i}.conv1/bn1/... → res{i+1}.conv1/bn1/...
  convPa.0/.1/.3          → convPa.conv0 / convPa.bn / convPa.conv1
  convDa.0/.1/.3          → convDa.conv0 / convDa.bn / convDa.conv1
  convPb / convDb / ConvSta → convPb / convDb / convSta

Conv kernels transpose OIHW → HWIO (grouped convs share the same
transpose since torch stores [out, in/groups, kh, kw]).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _strip_prefix(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = np.asarray(v)
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint (.pth) into numpy arrays."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def convert_ressegnet(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Build the Flax variables dict {'params':…, 'batch_stats':…}."""
    sd = _strip_prefix(state)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_unit(torch_name: str, flax_name: str, has_bn: bool):
        params[flax_name] = {
            "conv": {
                "kernel": _conv_kernel(sd[f"{torch_name}.0.weight"]),
                "bias": sd[f"{torch_name}.0.bias"],
            }
        }
        if has_bn:
            stats[flax_name] = {
                "bn": {
                    "mean": sd[f"{torch_name}.1.running_mean"],
                    "var": sd[f"{torch_name}.1.running_var"],
                }
            }

    def bn_relu(torch_name: str, flax_name: str):
        stats[flax_name] = {
            "bn": {
                "mean": sd[f"{torch_name}.0.running_mean"],
                "var": sd[f"{torch_name}.0.running_var"],
            }
        }

    def res_block(torch_name: str, flax_name: str):
        p = {}
        s = {}
        for i in (1, 2, 3):
            p[f"conv{i}"] = {"kernel": _conv_kernel(sd[f"{torch_name}.conv{i}.weight"])}
            p[f"bn{i}"] = {
                "scale": sd[f"{torch_name}.bn{i}.weight"],
                "bias": sd[f"{torch_name}.bn{i}.bias"],
            }
            s[f"bn{i}"] = {
                "mean": sd[f"{torch_name}.bn{i}.running_mean"],
                "var": sd[f"{torch_name}.bn{i}.running_var"],
            }
        params[flax_name] = p
        stats[flax_name] = s

    def head(torch_name: str, flax_name: str):
        params[flax_name] = {
            "conv0": {
                "kernel": _conv_kernel(sd[f"{torch_name}.0.weight"]),
                "bias": sd[f"{torch_name}.0.bias"],
            },
            "bn": {
                "scale": sd[f"{torch_name}.1.weight"],
                "bias": sd[f"{torch_name}.1.bias"],
            },
            "conv1": {
                "kernel": _conv_kernel(sd[f"{torch_name}.3.weight"]),
                "bias": sd[f"{torch_name}.3.bias"],
            },
        }
        stats[flax_name] = {
            "bn": {
                "mean": sd[f"{torch_name}.1.running_mean"],
                "var": sd[f"{torch_name}.1.running_var"],
            }
        }

    def plain_conv(torch_name: str, flax_name: str):
        params[flax_name] = {
            "kernel": _conv_kernel(sd[f"{torch_name}.weight"]),
            "bias": sd[f"{torch_name}.bias"],
        }

    for stage in (1, 2, 3):
        conv_unit(f"conv{stage}a", f"conv{stage}a", has_bn=True)
        conv_unit(f"conv{stage}b", f"conv{stage}b", has_bn=False)
        bn_relu(f"bn{stage}b", f"bn{stage}b")
    for i in range(3):
        res_block(f"conv4.{i}", f"res{i+1}")
    head("convPa", "convPa")
    head("convDa", "convDa")
    plain_conv("convPb", "convPb")
    plain_conv("convDb", "convDb")
    if "ConvSta.weight" in sd:
        plain_conv("ConvSta", "convSta")

    import jax.numpy as jnp
    import jax

    to_jnp = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), t)
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def convert_checkpoint(path: str) -> Dict[str, Any]:
    return convert_ressegnet(load_torch_state_dict(path))
