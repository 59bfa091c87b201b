"""Atom-type marginal distribution JSD.

Functional parity target: utils/evaluation/eval_atom_type.py:15-35. The
reference marginal is the published MOSES2 heavy-atom frequency (a dataset
statistic); it can also be rebuilt from data with `build_distribution`."""
from __future__ import annotations

from collections import Counter
from typing import Dict, Sequence

import numpy as np
from scipy.spatial.distance import jensenshannon

# MOSES2 training-set heavy-atom marginal (dataset statistic; same reference
# distribution the upstream metric uses)
MOSES2_ATOM_TYPE_DISTRIBUTION: Dict[int, float] = {
    6: 0.6715020339893559,
    7: 0.11703509510732567,
    8: 0.16956379168491933,
    9: 0.01307879304486639,
    15: 0.01113716146426898,
    16: 0.01123926340861198,
    17: 0.006443861300651673,
}


def build_distribution(atomic_num_lists: Sequence[Sequence[int]]
                       ) -> Dict[int, float]:
    counter = Counter()
    for nums in atomic_num_lists:
        counter.update(int(z) for z in nums)
    total = sum(counter.values())
    return {z: c / total for z, c in sorted(counter.items())}


def eval_atom_type_distribution(pred_counter: Counter,
                                reference: Dict[int, float] | None = None
                                ) -> float:
    ref = reference or MOSES2_ATOM_TYPE_DISTRIBUTION
    total = sum(pred_counter.values())
    if total == 0:
        return float("nan")
    pred = np.array([pred_counter.get(z, 0) / total for z in ref])
    return float(jensenshannon(np.array(list(ref.values())), pred))
