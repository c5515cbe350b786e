"""Feature-track building from verified pairwise matches (host, numpy DSU).

Capability parity: the track-building stage inside COLMAP's
``point_triangulator`` (``hloc/triangulation.py:129-147``) — chaining
verified two-view matches into multi-view tracks. Union-find with path
halving over (image, keypoint) observation nodes; tracks observing the
same image twice are split (the conflicting later observation is
dropped, mirroring COLMAP's conflict handling).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]  # path halving
            i = p[i]
        return i

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    num_keypoints: Dict[int, int],
    verified_matches: Sequence[Tuple[int, int, np.ndarray]],
    min_track_length: int = 2,
) -> List[List[Tuple[int, int]]]:
    """Chain matches into tracks.

    Args:
      num_keypoints: image_id → #keypoints.
      verified_matches: (image_id0, image_id1, matches [M, 2] kp-index
        pairs) per verified image pair.
      min_track_length: minimum observations to keep a track.

    Returns list of tracks, each a list of (image_id, kp_idx), with at
    most one observation per image (first by union order wins).
    """
    image_ids = sorted(num_keypoints.keys())
    offsets = {}
    total = 0
    for iid in image_ids:
        offsets[iid] = total
        total += num_keypoints[iid]

    # Flatten all match edges into global node ids.
    edge_list = []
    for id0, id1, matches in verified_matches:
        if len(matches) == 0:
            continue
        m = np.asarray(matches, np.int64)
        edge_list.append(m + np.array([offsets[id0], offsets[id1]], np.int64))
    edges = (
        np.concatenate(edge_list) if edge_list else np.zeros((0, 2), np.int64)
    )

    # Native union-find (C++ via ctypes) with pure-python fallback.
    from sfd2_tpu.native import union_find_roots

    roots = union_find_roots(total, edges)
    if roots is None:
        dsu = UnionFind(total)
        for a, b in edges:
            dsu.union(int(a), int(b))
        roots = np.array([dsu.find(i) for i in range(total)], np.int64)
    order = np.argsort(roots, kind="stable")
    sorted_roots = roots[order]
    boundaries = np.nonzero(np.diff(sorted_roots))[0] + 1
    groups = np.split(order, boundaries)

    # Reverse offset lookup.
    bounds = np.array([offsets[iid] for iid in image_ids] + [total])

    tracks: List[List[Tuple[int, int]]] = []
    for g in groups:
        if len(g) < min_track_length:
            continue
        obs: List[Tuple[int, int]] = []
        seen_imgs = set()
        for node in np.sort(g):
            img_pos = int(np.searchsorted(bounds, node, side="right") - 1)
            iid = image_ids[img_pos]
            if iid in seen_imgs:
                continue  # conflicting second observation in same image
            seen_imgs.add(iid)
            obs.append((iid, int(node - bounds[img_pos])))
        if len(obs) >= min_track_length:
            tracks.append(obs)
    return tracks


def build_tracks_arrays(
    n_images: int,
    kp_per_image: int,
    edges: np.ndarray,
    min_track_length: int = 2,
):
    """Vectorised track builder for reconstruction-scale graphs.

    Same semantics as :func:`build_tracks` (one observation per image per
    track, first keypoint index wins; tracks with ≥ `min_track_length`
    distinct images kept) but nodes are ``image_row * kp_per_image +
    kp_idx`` and the output is flat arrays — no per-track python lists,
    which at Aachen scale (~10⁷ observations, the map size the reference
    localizes against) cost minutes and GBs of tuple objects.

    Returns ``(obs_img_row, obs_kp, obs_track, n_tracks)`` int32/int64
    arrays sorted by track id.
    """
    from sfd2_tpu.native import union_find_roots

    total = n_images * kp_per_image
    edges = np.asarray(edges, np.int64).reshape(-1, 2)
    roots = union_find_roots(total, edges)
    if roots is None:
        dsu = UnionFind(total)
        for a, b in edges:
            dsu.union(int(a), int(b))
        roots = np.array([dsu.find(i) for i in range(total)], np.int64)

    nodes = np.unique(edges)  # only nodes with ≥1 match edge form tracks
    comp = roots[nodes]
    _, track_of = np.unique(comp, return_inverse=True)
    img = nodes // kp_per_image
    kp = nodes % kp_per_image

    # One observation per (track, image): lexsort by (track, img, kp) and
    # keep the first kp of each (track, img) run.
    order = np.lexsort((kp, img, track_of))
    t_s, i_s, k_s = track_of[order], img[order], kp[order]
    first = np.ones(len(order), bool)
    first[1:] = (t_s[1:] != t_s[:-1]) | (i_s[1:] != i_s[:-1])
    t_s, i_s, k_s = t_s[first], i_s[first], k_s[first]

    # Track-length filter + dense renumbering.
    lengths = np.bincount(t_s)
    keep_tracks = lengths >= min_track_length
    renum = np.cumsum(keep_tracks) - 1
    keep_obs = keep_tracks[t_s]
    return (
        i_s[keep_obs].astype(np.int32),
        k_s[keep_obs].astype(np.int32),
        renum[t_s[keep_obs]].astype(np.int64),
        int(keep_tracks.sum()),
    )
