"""Evaluation plots (matplotlib, host side).

Functional parity target: plot_distance_hist
(utils/evaluation/eval_bond_length.py:89-108)."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from shapemol_tpu.eval.bond_length import PAIR_BINS


def plot_distance_hist(pair_length_profile: Dict[str, np.ndarray],
                       reference_profile: Dict[str, np.ndarray],
                       metrics: Optional[Dict[str, float]] = None,
                       save_path: Optional[str] = None) -> None:
    """Step plots of the generated vs reference pair-distance distributions
    (one subplot per tracked profile key)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = list(reference_profile)
    fig, axes = plt.subplots(1, len(keys), figsize=(6 * len(keys), 4),
                             squeeze=False)
    for ax, key in zip(axes[0], keys):
        x = PAIR_BINS.get(key)
        gt = reference_profile[key]
        if x is None:
            x = np.arange(len(gt) - 1)
        ax.step(x, gt[1:], label="True")
        if key in pair_length_profile:
            ax.step(x, pair_length_profile[key][1:], label="Learned")
        ax.legend()
        title = key
        if metrics and f"JSD_{key}" in metrics and metrics[f"JSD_{key}"]:
            title += f"  JS div: {metrics[f'JSD_{key}']:.4f}"
        ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
    plt.close(fig)
