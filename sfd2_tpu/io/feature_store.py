"""HDF5 feature / match stores.

Capability parity: the reference's extraction CLI writes one HDF5 group
per image with ``keypoints`` [N,2|3], ``descriptors`` **[128, N]**
(transposed at ``extract_localization.py:253``), ``scores`` [N] and
``image_size``; the matching CLI writes groups named
``names_to_pair(n0, n1)`` with ``matches0`` (int) and
``matching_scores0`` (``hloc/match_features.py:113-119``). Both stages
are resumable by skipping existing groups (``hloc/match_features.py:94``).

This module reads/writes that exact layout (so artifacts interoperate
with reference tooling) while exposing padded fixed-K arrays + validity
masks to the device pipeline.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterable, NamedTuple

import h5py
import numpy as np


class ImageFeatures(NamedTuple):
    keypoints: np.ndarray  # [N, 2] float32 (x, y)
    descriptors: np.ndarray  # [N, C] float32
    scores: np.ndarray  # [N] float32
    image_size: np.ndarray | None  # [2] (w, h) or None
    labels: np.ndarray | None = None  # [N] int32 semantic ids (0 = none)


def names_to_pair(name0: str, name1: str) -> str:
    """hloc pair-group key (``hloc/utils/parsers.py:66``)."""
    return "_".join((name0.replace("/", "-"), name1.replace("/", "-")))


def _open_h5(path: Path, mode: str):
    """Open an HDF5 store; on append/write modes, recover ONLY from true
    corruption (a writer killed mid-flush leaves a non-HDF5 stub) — a
    transient open error on a valid file (e.g. lock contention from a
    still-alive writer) must propagate, never delete the store."""
    try:
        return h5py.File(path, mode)
    except OSError:
        corrupt = path.exists() and not h5py.is_hdf5(str(path))
        if mode in ("a", "w") and corrupt:
            path.unlink()
            return h5py.File(path, mode)
        raise


class FeatureStore:
    """Read/write per-image features (reference-compatible layout).

    Append-mode opens recover from truncated files (a previous writer
    killed mid-flush leaves an unopenable HDF5; the store is resumable,
    so the safe recovery is to start it fresh)."""

    def __init__(self, path: os.PathLike, mode: str = "r"):
        self.path = Path(path)
        self._f = _open_h5(self.path, mode)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __contains__(self, name: str) -> bool:
        return name in self._f

    def keys(self) -> Iterable[str]:
        def walk(group, prefix=""):
            for k, v in group.items():
                full = f"{prefix}/{k}" if prefix else k
                if isinstance(v, h5py.Group):
                    if "keypoints" in v:
                        yield full
                    else:
                        yield from walk(v, full)

        return list(walk(self._f))

    def write(self, name: str, feats: ImageFeatures, as_half: bool = False) -> None:
        """`as_half` stores descriptors as float16 (hloc's as_half option,
        ``hloc/extract_features.py:633-637``) — halves storage; reads
        upcast back to float32."""
        if name in self._f:
            del self._f[name]
        grp = self._f.create_group(name)
        grp.create_dataset("keypoints", data=np.asarray(feats.keypoints, np.float32))
        # Reference stores descriptors transposed [C, N].
        desc = np.ascontiguousarray(np.asarray(feats.descriptors).T)
        if as_half:
            desc = desc.astype(np.float16)
        grp.create_dataset("descriptors", data=desc)
        grp.create_dataset("scores", data=np.asarray(feats.scores, np.float32))
        if feats.image_size is not None:
            grp.create_dataset("image_size", data=np.asarray(feats.image_size))
        if feats.labels is not None:
            # Reference emits per-keypoint semantic ids alongside the
            # features when extraction ran with a mask
            # (``nets/extractor.py:316-321`` "labels" key).
            grp.create_dataset("labels", data=np.asarray(feats.labels, np.int32))

    def read(self, name: str) -> ImageFeatures:
        grp = self._f[name]
        kpts = grp["keypoints"][()].astype(np.float32)
        desc = grp["descriptors"][()].astype(np.float32)
        if desc.shape[0] != kpts.shape[0] and desc.shape[1] == kpts.shape[0]:
            desc = desc.T  # stored [C, N]
        scores = grp["scores"][()].astype(np.float32).reshape(-1)
        size = grp["image_size"][()] if "image_size" in grp else None
        labels = grp["labels"][()].astype(np.int32) if "labels" in grp else None
        return ImageFeatures(kpts[:, :2], desc, scores, size, labels)

    def read_padded(self, name: str, k: int, with_labels: bool = False):
        """Return (keypoints [k,2], descriptors [k,C], scores [k], valid [k])
        — plus labels [k] int32 (0-filled when absent) if `with_labels`."""
        f = self.read(name)
        n = min(len(f.keypoints), k)
        c = f.descriptors.shape[1]
        kp = np.zeros((k, 2), np.float32)
        de = np.zeros((k, c), np.float32)
        sc = np.zeros((k,), np.float32)
        va = np.zeros((k,), bool)
        kp[:n] = f.keypoints[:n]
        de[:n] = f.descriptors[:n]
        sc[:n] = f.scores[:n]
        va[:n] = True
        if with_labels:
            lb = np.zeros((k,), np.int32)
            if f.labels is not None:
                lb[:n] = f.labels[:n]
            return kp, de, sc, va, lb
        return kp, de, sc, va


class MatchStore:
    """Read/write pairwise matches (reference-compatible layout).

    Like FeatureStore, append-mode opens recover from truncated files."""

    def __init__(self, path: os.PathLike, mode: str = "r"):
        self.path = Path(path)
        self._f = _open_h5(self.path, mode)

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def has_pair(self, name0: str, name1: str) -> bool:
        return names_to_pair(name0, name1) in self._f or names_to_pair(
            name1, name0
        ) in self._f

    def write(self, name0, name1, matches0: np.ndarray, scores0: np.ndarray | None = None):
        key = names_to_pair(name0, name1)
        if key in self._f:
            del self._f[key]
        grp = self._f.create_group(key)
        # int32, not the reference's int16: max_keypoints is a free knob and
        # indices above 32767 must not silently wrap.
        grp.create_dataset("matches0", data=np.asarray(matches0, np.int32))
        if scores0 is not None:
            grp.create_dataset(
                "matching_scores0", data=np.asarray(scores0, np.float16)
            )

    def read(self, name0, name1, num_keypoints0: int | None = None):
        """Return (matches0 [N0] int, scores0 [N0] float) with orientation
        handling: reading a reversed pair inverts the match direction.

        For reversed reads, pass `num_keypoints0` (name0's keypoint count)
        to size the output; otherwise the array covers only up to the
        largest matched index (sufficient for consumers that iterate the
        matched entries, not for positional indexing).
        """
        key = names_to_pair(name0, name1)
        if key in self._f:
            grp = self._f[key]
            m = grp["matches0"][()].astype(np.int64)
            s = (
                grp["matching_scores0"][()].astype(np.float32)
                if "matching_scores0" in grp
                else np.zeros(len(m), np.float32)
            )
            return m, s
        rkey = names_to_pair(name1, name0)
        grp = self._f[rkey]
        m_rev = grp["matches0"][()].astype(np.int64)
        s_rev = (
            grp["matching_scores0"][()].astype(np.float32)
            if "matching_scores0" in grp
            else np.zeros(len(m_rev), np.float32)
        )
        # Invert: matches0_fwd[j] = i where m_rev[i] = j.
        max_idx = int(m_rev.max()) + 1 if m_rev.size and m_rev.max() >= 0 else 0
        n0 = num_keypoints0 if num_keypoints0 is not None else max_idx
        m = np.full(max(n0, 0), -1, np.int64)
        s = np.zeros(max(n0, 0), np.float32)
        src = np.nonzero(m_rev >= 0)[0]
        src = src[m_rev[src] < n0]
        m[m_rev[src]] = src
        s[m_rev[src]] = s_rev[src]
        return m, s
