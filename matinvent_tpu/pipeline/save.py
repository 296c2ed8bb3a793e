"""Structure saving utilities (parity with /root/reference/pipeline/utils/save.py)."""
from __future__ import annotations

import os
import pickle
from typing import List, Sequence

from matinvent_tpu.chem.structure import Structure, save_extxyz


def save_structures(structures: Sequence[Structure], save_dir: str, filename: str) -> str:
    """Write structures to ``save_dir/filename`` as extxyz; returns abs path."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, filename))
    save_extxyz(list(structures), path)
    return path


def save_samples(data_list: List[dict], save_dir: str, filename: str) -> str:
    """Pickle model-side sample payloads (save.py:8-29 counterpart)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, filename))
    with open(path, "wb") as fh:
        pickle.dump(data_list, fh)
    return path
