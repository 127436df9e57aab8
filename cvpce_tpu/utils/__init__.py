"""Host-side utilities: torch checkpoint import, label/tensor mapping."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def labels_to_tensors(*label_lists: Sequence) -> Tuple:
    """Convert N lists of hashable labels to int arrays plus a shared key
    (mirrors cvpce/utils.py:290-295). Returns (*arrays, key)."""
    key: List = []
    lookup = {}
    arrays = []
    for labels in label_lists:
        ids = []
        for lbl in labels:
            if lbl not in lookup:
                lookup[lbl] = len(key)
                key.append(lbl)
            ids.append(lookup[lbl])
        arrays.append(np.asarray(ids, dtype=np.int64))
    return (*arrays, key)


def tensors_to_labels(key: Sequence, *arrays) -> List[List]:
    """Inverse of labels_to_tensors (cvpce/utils.py:297-298)."""
    return [[key[int(i)] for i in arr] for arr in arrays]
