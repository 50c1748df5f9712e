"""Small IO + introspection helpers (reference mm_utils/utils.py:256-293)."""

from __future__ import annotations

import json
import pickle
from typing import Any, Dict, List

import numpy as np


def load_json(path: str) -> Any:
    with open(path) as f:
        return json.load(f)


def save_json(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def load_jsonl(path: str) -> List[Any]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def save_jsonl(rows: List[Any], path: str) -> None:
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def load_pkl(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def load_csv(path: str) -> List[Dict]:
    import csv

    with open(path, newline="") as f:
        return [dict(row) for row in csv.DictReader(f)]


def get_parameter_number(params, trainable_mask=None) -> Dict[str, int]:
    """Total / trainable parameter counts for a param pytree (reference
    mm_utils/utils.py:288-291). trainable_mask: matching bool pytree
    (train/optimizer.trainable_mask), else all counted trainable."""
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    total = int(sum(np.prod(x.shape) for x in leaves if hasattr(x, "shape")))
    if trainable_mask is None:
        trainable = total
    else:
        pairs = zip(leaves, jax.tree_util.tree_leaves(trainable_mask))
        trainable = int(sum(np.prod(x.shape) for x, m in pairs
                            if hasattr(x, "shape") and m))
    return {"Total": total, "Trainable": trainable}
