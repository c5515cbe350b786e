"""ADE20k semantic-class → stability mapping (data tables).

Capability parity: ``nets/semseg/utils.py`` + ``object150_info_ext.csv`` —
each of the 150 ADE20k classes is mapped to a coarse stability category
{0 invalid, 1 stable, 2 dynamic, 3 short-term}, and categories map to
confidences {0: 0.1, 1: 1.0, 2: 0.1, 3: 0.5} (``utils.py:31-49``).

The table below reproduces the reference CSV's Label column (classes are
1-indexed as in ADE20k; index 0 here is a padding slot treated as
invalid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Stability category per ADE20k class id 1..150 (csv Label column).
_ADE20K_STABILITY = np.array(
    [0]  # class id 0: unused / unlabeled → invalid
    + [
        1, 1, 0, 1, 3, 1, 1, 1, 1, 3,
        1, 1, 2, 1, 1, 1, 0, 3, 0, 1,
        2, 0, 1, 1, 1, 1, 0, 0, 0, 0,
        1, 1, 1, 1, 1, 1, 1, 0, 1, 1,
        1, 1, 1, 1, 1, 1, 0, 0, 1, 1,
        1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
        0, 1, 1, 1, 1, 1, 3, 1, 0, 0,
        1, 1, 0, 1, 1, 1, 2, 1, 1, 1,
        2, 1, 0, 0, 1, 1, 1, 1, 1, 1,
        2, 0, 1, 1, 0, 1, 1, 1, 1, 1,
        1, 1, 2, 2, 0, 1, 1, 1, 1, 0,
        1, 1, 1, 0, 1, 1, 2, 1, 1, 1,
        2, 1, 1, 1, 1, 1, 2, 2, 0, 1,
        1, 1, 1, 2, 1, 1, 1, 1, 1, 2,
        1, 1, 1, 1, 1, 0, 1, 1, 1, 1,
    ],
    dtype=np.int32,
)

# Category → confidence (``get_conf_dict``).
_CATEGORY_CONF = np.array([0.1, 1.0, 0.1, 0.5], dtype=np.float32)


def stability_category(seg_labels: jax.Array) -> jax.Array:
    """ADE20k class map [...] (int, 1..150; 0 = unlabeled) → category map."""
    table = jnp.asarray(_ADE20K_STABILITY)
    idx = jnp.clip(seg_labels, 0, len(_ADE20K_STABILITY) - 1)
    return table[idx]


def semantic_to_confidence(seg_labels: jax.Array) -> jax.Array:
    """Class map → confidence map in {0.1, 0.5, 1.0}
    (``segmantic_to_confidence``, ``utils.py:70``)."""
    return jnp.asarray(_CATEGORY_CONF)[stability_category(seg_labels)]


def confidence_to_class(conf: jax.Array) -> jax.Array:
    """Confidence {0.1, 0.5, 1.0} → 3-class stability target {0, 1, 2}
    (``nets/losses.py:420-423``)."""
    cls = jnp.full(conf.shape, 2, jnp.int32)
    cls = jnp.where(jnp.abs(conf - 0.1) < 1e-6, 0, cls)
    cls = jnp.where(jnp.abs(conf - 0.5) < 1e-6, 1, cls)
    return cls
