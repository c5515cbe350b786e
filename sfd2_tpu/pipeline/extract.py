"""Batched feature-extraction pipeline (image files → HDF5 feature store).

Capability parity: ``extract_localization.py`` — the DB/query extraction
CLI with its named conf registry (max_keypoints 4096/3000/2000/1000,
conf_th 0.001, resize_max 1600/1024, single scale), cv2 BGR→RGB loading
with INTER_CUBIC max-edge resize (``:164-178``), keypoint rescale
``(kp + 0.5) * scale − 0.5`` back to original resolution (``:263``), and
the HDF5 group layout. Also covers ``extract.py:205``'s single-image
path and the multi-scale pyramid (``extract.py:87``, scales kwarg).

TPU-native redesign: images are padded to bucketed static shapes and
processed as batches through ONE jitted program (model forward → stability
fold → NMS → top-K → descriptor sampling), instead of the reference's
per-image python loop with host NMS. Padding regions are masked out by
score (padded pixels produce conf 0 < conf_th).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sfd2_tpu.io.feature_store import FeatureStore, ImageFeatures
from sfd2_tpu.models.sfd2 import ResSegNetV2
from sfd2_tpu.ops.extract import extract_keypoints
from sfd2_tpu.ops.resize import resize_bilinear

# ImageNet normalisation (``nets/extractor.py:14-15``).
_RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ExtractionConfig:
    max_keypoints: int = 4096
    conf_threshold: float = 0.001
    nms_radius: int = 4
    border: int = 4
    resize_max: int = 1600
    # Scale pyramid: a fixed tuple, or "auto" for the reference's
    # ×1/1.2-until-min-edge<256 pyramid (``extract.py:87-200``,
    # extrat_spp_feats_multiscale) with per-image depth.
    scales: Tuple[float, ...] | str = (1.0,)
    pad_multiple: int = 64  # static-shape bucketing granularity
    batch_size: int = 16  # measured on the v5e @1024²: 5.91 ms/img at 16
    #                       vs 6.16 at 8 (latency-hiding across images);
    #                       host RAM/HBM comfortably fit 16×1600² padded
    bf16: bool | None = None  # run the conv stack in bfloat16. None = auto:
    #                     on by default on TPU (f32 matmuls already run at
    #                     bf16 MXU precision there, so bf16 only cuts
    #                     memory traffic — measurably faster, near-zero
    #                     extra rounding); off on CPU. Score ranking can
    #                     shift on near-ties — pass False for bit-exact
    #                     recall-parity validation runs.
    fused_stem: bool | None = None  # fused s2d stem (ops/stem.py): the
    #                     3-channel conv1a never runs at full resolution.
    #                     None = follow bf16: the fold reorders summations
    #                     (float-exact zeros, ~1e-6 f32 deltas), so it
    #                     rides the same "bf16=False → bit-exact" contract.
    stem_backend: str = "auto"  # "xla" (s2d convs, in-graph repack) |
    #                     "pallas" (ops/pallas_stem.py kernel on HOST-packed
    #                     plane rows — the s2d transpose costs 0 device
    #                     time) | "auto": pallas on TPU, xla elsewhere.
    #                     Only consulted when fused_stem is on.
    as_half: bool = False  # store descriptors as float16 (hloc as_half)


# Named presets mirroring the reference registry
# (``extract_localization.py:26-120``; long names abbreviated to the knobs
# that differ).
EXTRACTION_CONFS: Dict[str, ExtractionConfig] = {
    "sfd2-n4096-r1600": ExtractionConfig(max_keypoints=4096, resize_max=1600),
    "sfd2-n3000-r1600": ExtractionConfig(max_keypoints=3000, resize_max=1600),
    "sfd2-n2000-r1600": ExtractionConfig(max_keypoints=2000, resize_max=1600),
    "sfd2-n1000-r1600": ExtractionConfig(max_keypoints=1000, resize_max=1600),
    "sfd2-n4096-r1024": ExtractionConfig(max_keypoints=4096, resize_max=1024),
    "sfd2-n4096-r1600-ms": ExtractionConfig(
        max_keypoints=4096, resize_max=1600, scales=(1.0, 0.8333, 0.6944)
    ),
    "sfd2-n4096-r1600-msauto": ExtractionConfig(
        max_keypoints=4096, resize_max=1600, scales="auto"
    ),
}


_AUTO_SCALE_STEP = 1.2
_AUTO_MIN_EDGE = 256


def auto_scales(min_edges: Sequence[int]):
    """Per-image ×1/1.2 pyramid depths (``extract.py:87-200``: scale /= 1.2
    while the scaled min edge stays ≥ 256; scale 1.0 always included).

    Returns (scales tuple covering the deepest image, active[k][i] bool —
    whether image i participates at scale step k)."""
    depths = []
    for e in min_edges:
        d = 1
        while e / _AUTO_SCALE_STEP**d >= _AUTO_MIN_EDGE:
            d += 1
        depths.append(d)
    n = max(depths)
    scales = tuple(1.0 / _AUTO_SCALE_STEP**k for k in range(n))
    active = [[k < d for d in depths] for k in range(n)]
    return scales, active


def load_image(path, resize_max: int | None):
    """cv2 load (BGR→RGB) + INTER_CUBIC max-edge resize; returns
    (float32 [H,W,3] in [0,1], original (w, h))."""
    import cv2

    bgr = cv2.imread(str(path))
    if bgr is None:
        raise FileNotFoundError(path)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    h, w = rgb.shape[:2]
    if resize_max and max(h, w) > resize_max:
        scale = resize_max / max(h, w)
        rgb = cv2.resize(
            rgb, (int(round(w * scale)), int(round(h * scale))), interpolation=cv2.INTER_CUBIC
        )
    return rgb.astype(np.float32) / 255.0, (w, h)


def normalize_image(img: np.ndarray) -> np.ndarray:
    return (img - _RGB_MEAN) / _RGB_STD


def load_label_map(path) -> np.ndarray:
    """Load a semantic-mask image into a packed int32 id map.

    The reference packs a BGR mask image as
    ``id = R·65536 + G·256 + B`` with 0 = unlabeled
    (``nets/extractor.py:252``); identical packing here.
    Returns [H, W] int32.
    """
    import cv2

    bgr = cv2.imread(str(path))
    if bgr is None:
        raise FileNotFoundError(path)
    b = bgr[:, :, 0].astype(np.int32)
    g = bgr[:, :, 1].astype(np.int32)
    r = bgr[:, :, 2].astype(np.int32)
    return r * 65536 + g * 256 + b


def _pow2_ceil(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _resize_labels_nearest(labels: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize for id maps (ids cannot be interpolated)."""
    h, w = hw
    if labels.shape[:2] == (h, w):
        return labels
    ys = np.clip((np.arange(h) + 0.5) * labels.shape[0] / h, 0, labels.shape[0] - 1)
    xs = np.clip((np.arange(w) + 0.5) * labels.shape[1] / w, 0, labels.shape[1] - 1)
    return labels[ys.astype(np.int64)[:, None], xs.astype(np.int64)[None, :]]


class Extractor:
    """Jitted batched extraction with a per-shape program cache."""

    def __init__(self, variables, config: ExtractionConfig = ExtractionConfig(),
                 model: ResSegNetV2 | None = None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a 'data' axis — image
        batches are sharded over it (keyframe data parallelism, the
        extraction half of the north-star multi-chip story); params are
        replicated and XLA partitions the whole program."""
        self.mesh = mesh
        if config.bf16 is None:
            config = dataclasses.replace(
                config, bf16=jax.default_backend() == "tpu"
            )
        # The resolved numerics choice silently changes score ranking on
        # near-ties vs the f32 reference — always make it visible, so a
        # recall-parity run that forgot bf16=False is diagnosable.
        import logging

        logging.getLogger(__name__).info(
            "Extractor: trunk dtype %s (bf16=%s, backend=%s)",
            "bfloat16" if config.bf16 else "float32", config.bf16,
            jax.default_backend(),
        )
        if config.bf16:
            model = model or ResSegNetV2(require_stability=True, dtype=jnp.bfloat16)
            if model.dtype != jnp.bfloat16:
                import dataclasses as _dc

                model = _dc.replace(model, dtype=jnp.bfloat16)
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                variables,
            )
        self.model = model or ResSegNetV2(require_stability=True)
        self.variables = variables
        if config.fused_stem is None:
            config = dataclasses.replace(config, fused_stem=bool(config.bf16))
        self._packed_stem = None
        self._stem_weights = None  # pallas-kernel constants
        if config.fused_stem and hasattr(self.model, "forward_from_out1c"):
            try:
                from sfd2_tpu.ops.stem import repack_stem_params

                self._packed_stem = repack_stem_params(
                    variables["params"], variables["batch_stats"]
                )
            except (KeyError, TypeError):  # non-ResSegNet parameter tree
                self._packed_stem = None
        backend = config.stem_backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if self._packed_stem is not None and backend == "pallas" \
                and self.mesh is None:
            from sfd2_tpu.ops.pallas_stem import StemWeights

            self._stem_weights = StemWeights(self._packed_stem)
        self.cfg = config
        self._programs: Dict[Tuple[int, int, int], callable] = {}

    def _pad_hw(self, h: int, w: int) -> Tuple[int, int]:
        """Bucketed padded shape. The pallas stem kernel needs
        W/2 % 128 == 0 and H/2 % 8 == 0, so its buckets round W up to
        256 (H's 16-multiple is implied by pad_multiple ≥ 16)."""
        m = self.cfg.pad_multiple
        hp = -(-h // m) * m
        wp = -(-w // m) * m
        if self._stem_weights is not None:
            hp = -(-hp // 16) * 16
            wp = -(-wp // 256) * 256
        return hp, wp

    def _program(self, shape: Tuple[int, int, int], with_labels: bool = False):
        key = (shape, with_labels)
        if key not in self._programs:
            cfg = self.cfg
            packed_stem = self._packed_stem
            stem_dt = jnp.bfloat16 if cfg.bf16 else jnp.float32

            stem_weights = self._stem_weights
            interp = jax.default_backend() != "tpu"

            @jax.jit
            def run(variables, images_u8, sizes, label_map=None):
                # Images arrive as uint8 and are normalised on device:
                # 4x fewer bytes over the host↔device link (which is the
                # bottleneck behind a high-latency relay).
                if stem_weights is not None and images_u8.ndim == 4 \
                        and images_u8.shape[2] == 16:
                    # HOST-packed s2d plane rows [B, Hp, 16, W'] → the
                    # Pallas stem kernel (zero device-side transpose).
                    from sfd2_tpu.ops.pallas_stem import fused_stem_pallas

                    mean16 = jnp.concatenate(
                        [jnp.tile(jnp.asarray(_RGB_MEAN), 4), jnp.zeros(4)])
                    std16 = jnp.concatenate(
                        [jnp.tile(jnp.asarray(_RGB_STD), 4), jnp.ones(4)])
                    x2 = images_u8.astype(jnp.float32) / 255.0
                    x2 = (x2 - mean16[None, None, :, None]) \
                        / std16[None, None, :, None]
                    # Halo rows are conv zero-padding, NOT image pixels —
                    # normalisation must not turn them into -mean/std.
                    hp_rows = images_u8.shape[1]
                    row = jnp.arange(hp_rows)[None, :, None, None]
                    x2 = jnp.where((row < 2) | (row >= hp_rows - 6), 0.0, x2)
                    out1c = fused_stem_pallas(
                        x2, stem_weights.w1k, stem_weights.w2k,
                        stem_weights.b1, stem_weights.b2,
                        interpret=interp, out_dtype=stem_dt)
                    out = self.model.apply(
                        variables, out1c, method=self.model.forward_from_out1c)
                else:
                    images = images_u8.astype(jnp.float32) / 255.0
                    images = (images - jnp.asarray(_RGB_MEAN)) \
                        / jnp.asarray(_RGB_STD)
                    if packed_stem is not None and images.shape[1] % 2 == 0 \
                            and images.shape[2] % 2 == 0:
                        from sfd2_tpu.ops.stem import fused_stem_apply

                        out1c = fused_stem_apply(images, packed_stem, stem_dt)
                        out = self.model.apply(
                            variables, out1c,
                            method=self.model.forward_from_out1c)
                    else:
                        out = self.model.apply(variables, images)
                score = out.score
                if images_u8.shape[2] == 16 and stem_weights is not None:
                    h = (images_u8.shape[1] - 8) * 2  # minus halo rows
                    w = images_u8.shape[3] * 2
                else:
                    h, w = images_u8.shape[1], images_u8.shape[2]
                if score.shape[1] != h or score.shape[2] != w:
                    score = resize_bilinear(score[..., None], (h, w))[..., 0]
                kp = extract_keypoints(
                    score,
                    out.descriptors,
                    out.stability,
                    sizes,
                    label_map,
                    max_keypoints=cfg.max_keypoints,
                    conf_threshold=cfg.conf_threshold,
                    nms_radius=cfg.nms_radius,
                    border=cfg.border,
                )
                # Pack everything into ONE [B, K, 4+C(+1)] f32 buffer so the
                # host fetches a batch with a single blocking transfer
                # (each fetch through the relay costs a full RPC RTT).
                # Validity is 0/1; packed label ids are < 2^24, exact in f32.
                parts = [
                    kp.xy,
                    kp.scores[..., None],
                    kp.descriptors.astype(jnp.float32),
                    kp.valid[..., None].astype(jnp.float32),
                ]
                if kp.labels is not None:
                    parts.append(kp.labels[..., None].astype(jnp.float32))
                return jnp.concatenate(parts, axis=-1)

            self._programs[key] = run
        return self._programs[key]

    def _pad_batch(self, images: Sequence[np.ndarray]):
        """Pad to a bucketed shape as uint8 (normalisation happens on
        device — see _program). Inputs are float [0,1] images. Returns
        (batch, (hp, wp)); with the pallas stem the batch is HOST-packed
        s2d plane rows [B, hp/2+8, 16, wp/2] — the lane-hostile s2d
        transpose never runs on device (it cost 0.27 ms/img in XLA) and
        the wire bytes are identical."""
        hmax = max(im.shape[0] for im in images)
        wmax = max(im.shape[1] for im in images)
        hp, wp = self._pad_hw(hmax, wmax)
        if self._stem_weights is not None:
            h2, w2 = hp // 2, wp // 2
            batch = np.zeros((len(images), h2 + 8, 16, w2), np.uint8)
            for i, im in enumerate(images):
                u8 = np.clip(np.rint(im * 255.0), 0, 255).astype(np.uint8)
                for p in range(2):
                    for q in range(2):
                        sub = u8[p::2, q::2]  # [h_pq, w_pq, 3]
                        batch[i, 2:2 + sub.shape[0],
                              (p * 2 + q) * 3:(p * 2 + q) * 3 + 3,
                              : sub.shape[1]] = sub.transpose(0, 2, 1)
            return batch, (hp, wp)
        batch = np.zeros((len(images), hp, wp, 3), np.uint8)
        for i, im in enumerate(images):
            batch[i, : im.shape[0], : im.shape[1]] = np.clip(
                np.rint(im * 255.0), 0, 255
            ).astype(np.uint8)
        return batch, (hp, wp)

    def extract_batch(
        self,
        images: Sequence[np.ndarray],
        label_maps: Sequence[np.ndarray] | None = None,
    ) -> List[ImageFeatures]:
        """Extract from a list of float [H,W,3] images (possibly ragged).

        `label_maps`: optional per-image int32 [H,W] semantic-id maps (any
        resolution; nearest-resized to the working resolution). Enables
        labeled-first top-K and per-keypoint label output
        (``nets/extractor.py:240-326``)."""
        cfg = self.cfg
        with_labels = label_maps is not None
        all_feats: List[Dict[str, np.ndarray]] = [
            {"kp": [], "desc": [], "score": [], "label": []} for _ in images
        ]
        if cfg.scales == "auto":
            scales, active = auto_scales(
                [min(im.shape[0], im.shape[1]) for im in images]
            )
        else:
            scales = cfg.scales
            active = [[True] * len(images)] * len(scales)
        _dummy = np.zeros((1, 1, 3), np.float32)  # inactive at this depth:
        # never resized, never inflates the padded batch; its (1,1) size
        # border-masks every keypoint and act[i] skips collection anyway.
        for s, act in zip(scales, active):
            scaled = [
                (im if s == 1.0 else np.asarray(
                    resize_bilinear(
                        jnp.asarray(im),
                        (int(im.shape[0] * s), int(im.shape[1] * s)),
                    )
                )) if a else _dummy
                for im, a in zip(images, act)
            ]
            batch, (hp, wp) = self._pad_batch(scaled)
            sizes = jnp.asarray(
                np.array([[im.shape[1], im.shape[0]] for im in scaled], np.int32)
            )
            lbl = None
            if with_labels:
                lbl_np = np.zeros((len(scaled), hp, wp), np.int32)
                for i, im in enumerate(scaled):
                    lbl_np[i, : im.shape[0], : im.shape[1]] = _resize_labels_nearest(
                        label_maps[i], im.shape[:2]
                    )
                lbl = jnp.asarray(lbl_np)
            prog = self._program(batch.shape[1:], with_labels)
            if self.mesh is not None:
                from sfd2_tpu.parallel.mesh import put_batch, put_replicated

                batch_dev = put_batch(self.mesh, jnp.asarray(batch))
                sizes_dev = put_batch(self.mesh, sizes)
                variables = put_replicated(self.mesh, self.variables)
                lbl_dev = put_batch(self.mesh, lbl) if lbl is not None else None
                packed = prog(variables, batch_dev, sizes_dev, lbl_dev)
            else:
                packed = prog(self.variables, jnp.asarray(batch), sizes, lbl)
            packed = np.asarray(packed)  # ONE device→host fetch per batch
            c = packed.shape[-1] - (5 if with_labels else 4)
            xy = packed[..., 0:2]
            scores = packed[..., 2]
            descs = packed[..., 3:3 + c]
            valid = packed[..., 3 + c] > 0.5
            labels = packed[..., 4 + c].astype(np.int32) if with_labels else None
            for i, im in enumerate(images):
                if not act[i]:  # below this image's auto-pyramid depth
                    continue
                sh, sw = scaled[i].shape[:2]
                v = valid[i] & (xy[i, :, 0] < sw) & (xy[i, :, 1] < sh)
                pts = xy[i][v]
                if s != 1.0:
                    # Rescale to the resize_max resolution (reference
                    # multiplies by W/nw, ``nets/extractor.py:214-215``).
                    pts = pts * np.array(
                        [im.shape[1] / sw, im.shape[0] / sh], np.float32
                    )
                all_feats[i]["kp"].append(pts)
                all_feats[i]["desc"].append(descs[i][v])
                all_feats[i]["score"].append(scores[i][v])
                if labels is not None:
                    all_feats[i]["label"].append(labels[i][v])

        out = []
        for i, im in enumerate(images):
            kp = np.concatenate(all_feats[i]["kp"]) if all_feats[i]["kp"] else np.zeros((0, 2), np.float32)
            de = np.concatenate(all_feats[i]["desc"]) if all_feats[i]["desc"] else np.zeros((0, 128), np.float32)
            sc = np.concatenate(all_feats[i]["score"]) if all_feats[i]["score"] else np.zeros((0,), np.float32)
            lb = (
                np.concatenate(all_feats[i]["label"]).astype(np.int32)
                if with_labels and all_feats[i]["label"]
                else None
            )
            if lb is not None:
                # Cross-scale merge keeps the labeled-first invariant.
                boost = (sc.max() + 1.0) if sc.size else 1.0
                order = np.argsort(-(sc + boost * (lb > 0)))[: cfg.max_keypoints]
            else:
                order = np.argsort(-sc)[: cfg.max_keypoints]
            out.append(
                ImageFeatures(
                    kp[order], de[order], sc[order],
                    np.array([im.shape[1], im.shape[0]]),
                    lb[order] if lb is not None else None,
                )
            )
        return out

    def _probe_bucket(self, path) -> Tuple[int, int]:
        """Padded bucket shape an image will land in after load_image's
        resize — from a header-only size read (no pixel decode), so the
        whole work list can be grouped before any batch is assembled.
        Must mirror load_image's rounding exactly."""
        from PIL import Image

        with Image.open(path) as im:
            w, h = im.size
        rm = self.cfg.resize_max
        if rm and max(h, w) > rm:
            s = rm / max(h, w)
            w, h = int(round(w * s)), int(round(h * s))
        return self._pad_hw(h, w)

    def extract_to_store(
        self,
        image_dir,
        names: Iterable[str],
        store: FeatureStore,
        skip_existing: bool = True,
        mask_dir=None,
        mask_suffix: str = ".png",
    ) -> int:
        """Extract `names` (relative paths) into `store`; resumable like the
        reference (existing groups skipped). Returns #extracted.

        `mask_dir`: optional directory of per-image semantic-mask images
        (same relative path with extension replaced by `mask_suffix`);
        when given, extraction is labeled-first and a ``labels`` dataset
        is stored per image (consumed by the NNML matcher).

        Jit-bucket discipline (reference loader behaviour:
        ``extract_localization.py:122-178``): the WHOLE todo list is
        grouped by padded bucket shape first (header-only size probe),
        then each group is chunked into `batch_size` pieces — so an
        interleaved portrait/landscape list dispatches full-size batches
        per orientation instead of minting a per-chunk zoo of
        (B, hp, wp) programs (each a multi-minute remote TPU compile).
        Remainder chunks are padded with 1×1 dummies up to the next
        power of two, bounding batch dims per shape bucket to
        {batch_size} ∪ {one pow2 remainder}."""
        cfg = self.cfg
        import logging

        todo = [n for n in names if not (skip_existing and n in store)]
        groups: Dict[Tuple[int, int] | None, List[str]] = {}
        for n in todo:
            try:
                bkey = self._probe_bucket(Path(image_dir) / n)
            except Exception:
                bkey = None  # unreadable header: grouped together; load_image
                #               will raise (or handle) at decode time below
            groups.setdefault(bkey, []).append(n)
        if todo:
            batch_dims = set()
            for g in groups.values():
                if len(g) >= cfg.batch_size:
                    batch_dims.add(cfg.batch_size)
                r = len(g) % cfg.batch_size
                if r:
                    batch_dims.add(min(cfg.batch_size, _pow2_ceil(r)))
            logging.getLogger(__name__).info(
                "extract_to_store: %d images in %d shape bucket(s) %s; "
                "batch_size=%d, batch dims %s -> <=%d jit programs",
                len(todo), len(groups),
                {(f"{k[0]}x{k[1]}" if k else "?"): len(v)
                 for k, v in sorted(groups.items(), key=lambda kv: str(kv[0]))},
                cfg.batch_size, sorted(batch_dims),
                sum(1 + (len(g) % cfg.batch_size > 0
                         and len(g) >= cfg.batch_size)
                    for g in groups.values()),
            )
        count = 0
        for gnames in groups.values():
            for i in range(0, len(gnames), cfg.batch_size):
                chunk = gnames[i : i + cfg.batch_size]
                images, orig_sizes, lmaps = [], [], []
                for n in chunk:
                    im, (w0, h0) = load_image(Path(image_dir) / n, cfg.resize_max)
                    images.append(im)
                    orig_sizes.append((w0, h0))
                    if mask_dir is not None:
                        mpath = (Path(mask_dir) / n).with_suffix(mask_suffix)
                        lmaps.append(load_label_map(mpath))
                # Pad the batch dim of remainder chunks to the next power
                # of two with 1×1 dummies (border-masked to zero keypoints,
                # they never change the (hp, wp) bucket) so each shape
                # bucket compiles a bounded set of batch dims.
                n_real = len(images)
                bpad = min(cfg.batch_size, _pow2_ceil(n_real))
                while len(images) < bpad:
                    images.append(np.zeros((1, 1, 3), np.float32))
                    if mask_dir is not None:
                        lmaps.append(np.zeros((1, 1), np.int32))
                feats = self.extract_batch(
                    images, lmaps if mask_dir is not None else None
                )[:n_real]
                for n, f, (w0, h0), im in zip(chunk, feats, orig_sizes, images):
                    scale = np.array(
                        [w0 / im.shape[1], h0 / im.shape[0]], np.float32
                    )
                    # Reference rescale: (kp + 0.5) * scale − 0.5.
                    kp = (f.keypoints + 0.5) * scale - 0.5
                    store.write(
                        n,
                        ImageFeatures(
                            kp, f.descriptors, f.scores, np.array([w0, h0]), f.labels
                        ),
                        as_half=cfg.as_half,
                    )
                    count += 1
        return count
