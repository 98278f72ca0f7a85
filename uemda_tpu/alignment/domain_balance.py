"""Domain balance: valid-pixel counting and source/target loss weighting.

Rebuild of ``uemda/gast/domain_balance.py`` (dormant): count valid (non-
ignored) pixels over a split and derive a target-loss weight from the
source/target valid ratios.
"""

from typing import Tuple

import numpy as np


def examples_cnt(dataset, ignore_label: int = -1, prob_labels: bool = False
                 ) -> Tuple[float, float]:
    """(domain_balance.py:15-36): total valid pixels + mean valid ratio."""
    cnt = 0.0
    cnt_all = 0.0
    for i in range(len(dataset)):
        item = dataset.item(i)
        if prob_labels:
            lbl = np.argmax(item["prob"], axis=-1)
        else:
            lbl = item["label"]
        cnt += float((lbl != ignore_label).sum())
        cnt_all += float(lbl.size)
    return cnt, cnt / max(cnt_all, 1.0)


def get_target_weight(cnt_s, ratio_s, cnt_t, ratio_t) -> float:
    """(domain_balance.py:38-40)"""
    weight = cnt_t * ratio_s / (cnt_s * ratio_t + 1e-7)
    return 1.0 if weight >= 1.0 else float(weight)
