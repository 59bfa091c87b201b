"""Guidance-cloud construction shared by the sampling CLIs.

The reference guides against a VOLUME-FILLING cloud sampled from
atom-centered Gaussians of the target molecule (20 points/atom,
var = 1/(12*1.7) — utils/shape.py:164-173, built at
scripts/sample_diffusion.py:237-241), NOT the 512-point surface cloud:
with a surface cloud and radius 0.2 Å, interior atoms get dragged onto
the shell (measured: completeness 0.95 -> 0.40; STATUS round 3).

These constants are parity-critical, so both cli/sample.py and
cli/sample_sweep.py build their clouds through this one function.
"""
from __future__ import annotations

import numpy as np

N_PER_ATOM = 20
VAR = 1.0 / (12.0 * 1.7)
PAD_COORD = 1e6     # far-away dummy rows: never among the k=3 nearest


def build_guidance_cloud(ref_pos: np.ndarray, max_atoms: int, seed: int,
                         target_id) -> np.ndarray:
    """(n_atoms, 3) target coordinates -> (max_atoms * 20, 3) float32 cloud.

    Padded to a fixed size with far-away dummies so every target shares
    one compiled scan instead of recompiling per atom count. Raises
    SystemExit with a actionable message when the target exceeds
    max_atoms (the pad would go negative and np.stack would later fail
    with an opaque shape error — ADVICE r3).
    """
    if ref_pos.shape[0] > max_atoms:
        raise SystemExit(
            f"target {target_id} has {ref_pos.shape[0]} atoms > "
            f"--max_atoms {max_atoms}; rerun with --max_atoms >= "
            f"{ref_pos.shape[0]} (the guidance cloud is padded to a "
            "fixed max_atoms*20 size)")
    g_rng = np.random.default_rng(seed)
    pts = (ref_pos[:, None, :]
           + g_rng.normal(scale=np.sqrt(VAR),
                          size=(ref_pos.shape[0], N_PER_ATOM, 3)))
    pts = pts.reshape(-1, 3).astype(np.float32)
    pad_rows = max_atoms * N_PER_ATOM - pts.shape[0]
    if pad_rows > 0:
        pts = np.concatenate(
            [pts, np.full((pad_rows, 3), PAD_COORD, np.float32)], axis=0)
    return pts
