"""Small host utilities kept for API parity (utils.py:31-49)."""
from __future__ import annotations

from typing import Dict, List, Sequence


def merge_dic(dic1: Dict, dic2: Dict) -> Dict:
    return {**dic1, **dic2}


def task_divide(idx: Sequence, n: int) -> List[List]:
    """Split a list into n chunks, last chunk takes the remainder
    (utils.py:35-49)."""
    idx = list(idx)
    total = len(idx)
    if n <= 0 or total == 0 or n > total:
        return [idx]
    if n == total:
        return [[i] for i in idx]
    j = total // n
    tasks = [idx[i:i + j] for i in range(0, (n - 1) * j, j)]
    tasks.append(idx[(n - 1) * j:])
    return tasks
