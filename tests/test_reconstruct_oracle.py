"""Reconstruction oracle validation on REAL molecules: the shipped MOSES2
test set carries RDKit's own bond sets/orders (parsed without RDKit by
compat/rdkit_unpickle), giving exact ground truth for
perturb -> reconstruct -> compare. VERDICT r1 item 7.

Measured across the full 1000-molecule set (tools / this test on a subset):
  sigma=0.00: 99.9% exact bond sets, 0 failures
  sigma=0.05: 95.6% exact bond sets, 0 failures
"""
import os

import numpy as np
import pytest

from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
from shapemol_tpu.chem.reconstruct import (MolReconsError,
                                           reconstruct_from_generated)

TEST_PKL = "/root/reference/data/MOSES2_test_mol.pkl"
pytestmark = pytest.mark.skipif(not os.path.exists(TEST_PKL),
                                reason="reference test set not mounted")


@pytest.fixture(scope="module")
def testset():
    return load_rdkit_mol_pickle(TEST_PKL)[:300]


def _recover_rate(mols, sigma, seed=1):
    rng = np.random.default_rng(seed)
    exact = fail = 0
    for m in mols:
        pos = m.pos + rng.normal(scale=sigma, size=m.pos.shape)
        try:
            r = reconstruct_from_generated(pos, m.atomic_nums, m.aromatic,
                                           basic_mode=False)
        except MolReconsError:
            fail += 1
            continue
        ts = {(min(i, j), max(i, j)) for i, j, _ in m.bonds}
        gs = {(min(i, j), max(i, j)) for i, j, _ in r.bonds}
        exact += int(ts == gs)
    return exact / len(mols), fail


def test_zero_noise_recovery(testset):
    """Real geometry must reconstruct: no failures, >=99% exact bond sets
    (kekulé-aware valence check + terminal-double pre-pass + 58° angle
    cutoff — see chem/reconstruct.py docstrings)."""
    rate, fail = _recover_rate(testset, 0.0)
    assert fail == 0, f"{fail} reconstruction failures on real molecules"
    assert rate >= 0.99, f"bond-set recovery {rate:.3f} < 0.99"


def test_noisy_recovery(testset):
    """>=94% exact bond-set recovery at sigma=0.05 Å (VERDICT target 95%
    on the full set; 300-mol subset tolerance 94%)."""
    rate, fail = _recover_rate(testset, 0.05)
    assert fail == 0
    assert rate >= 0.94, f"bond-set recovery {rate:.3f} < 0.94"


def test_order_recovery_zero_noise(testset):
    """Bond ORDERS (incl. aromatic) also recover on exact geometry."""
    rng = np.random.default_rng(0)
    order_exact = 0
    for m in testset:
        try:
            r = reconstruct_from_generated(m.pos, m.atomic_nums, m.aromatic,
                                           basic_mode=False)
        except MolReconsError:
            continue
        td = {(min(i, j), max(i, j)): o for i, j, o in m.bonds}
        gd = {(min(i, j), max(i, j)): o for i, j, o in r.bonds}
        order_exact += int(td == gd)
    assert order_exact / len(testset) >= 0.88
