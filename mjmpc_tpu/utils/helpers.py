"""Small structural helpers (reference mjmpc/utils/helpers.py:101-116)."""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np


def stack_tensor_list(tensor_list: Sequence) -> np.ndarray:
    return np.stack([np.asarray(t) for t in tensor_list])


def stack_tensor_dict_list(tensor_dict_list: Sequence[Dict]) -> Dict:
    """List of (possibly nested) dicts -> dict of stacked arrays
    (reference helpers.stack_tensor_dict_list)."""
    keys = tensor_dict_list[0].keys()
    out: Dict[str, Any] = {}
    for k in keys:
        example = tensor_dict_list[0][k]
        if isinstance(example, dict):
            out[k] = stack_tensor_dict_list([d[k] for d in tensor_dict_list])
        else:
            out[k] = stack_tensor_list([d[k] for d in tensor_dict_list])
    return out
