"""Calibration of the self-contained chemical scorers against the shipped
MOSES2 test set's *construction filters* (the only RDKit-free ground truth
available here — RDKit is uninstallable in this environment, verified).

MOSES was built from ZINC Clean Leads with hard filters (Polykovskiy et
al. 2020): molecular weight 250-350 Da, rotatable bonds <= 7, XlogP <=
3.5, no charged atoms, allowed elements {C,N,S,O,F,Cl,Br,H}, MCF/PAINS
structural-alert filters. Every shipped test molecule passed those
filters, so any violation measured with OUR descriptors quantifies OUR
approximation error (caveats per descriptor below). Reference scoring
surface: utils/evaluation/scoring_func.py:66-82.
"""
import os

import numpy as np
import pytest

from shapemol_tpu.compat.rdkit_unpickle import load_rdkit_mol_pickle
from shapemol_tpu.eval import scoring

TEST_PKL = "/root/reference/data/MOSES2_test_mol.pkl"

pytestmark = pytest.mark.skipif(not os.path.exists(TEST_PKL),
                                reason="reference test pickle not present")


@pytest.fixture(scope="module")
def mols():
    return load_rdkit_mol_pickle(TEST_PKL)


def test_mol_weight_matches_filter_window(mols):
    """MW is computed exactly (atomic masses + calibrated H counts):
    the 250-350 Da filter must hold essentially everywhere."""
    mw = np.array([scoring.mol_weight(m) for m in mols])
    in_window = ((mw >= 249.0) & (mw <= 351.0)).mean()
    assert in_window >= 0.995, float(in_window)


def test_rotatable_bonds_filter_consistency(mols):
    """rotB <= 7 was a hard MOSES filter; our strict-definition count
    violates it on <2% of molecules (definition mismatch on amide-like
    and conjugated linkers), which bounds the descriptor's error."""
    rb = np.array([scoring.rotatable_bonds(m) for m in mols])
    assert (rb <= 7).mean() >= 0.98, float((rb <= 7).mean())
    # never wildly off
    assert rb.max() <= 10


def test_logp_bias_indicator(mols):
    """XlogP <= 3.5 was a MOSES filter. Our Crippen-flavored logP is a
    different estimator (Crippen itself exceeds XlogP on lipophilic
    aromatics), so the violation RATE is a bias indicator, not an exact
    error: it is recorded here and must not regress above 40%. The mean
    must sit in the lead-like band."""
    lp = np.array([scoring.logp(m) for m in mols])
    viol = float((lp > 3.5).mean())
    assert viol <= 0.40, viol
    assert 2.0 <= lp.mean() <= 3.3, float(lp.mean())
    # hydrocarbon anchors are the published Wildman-Crippen values and
    # must reproduce RDKit MolLogP exactly on pure-carbon skeletons
    from shapemol_tpu.chem.mol import Molecule
    benzene = Molecule(
        atomic_nums=np.array([6] * 6),
        pos=np.zeros((6, 3)),
        bonds=[(min(i, (i + 1) % 6), max(i, (i + 1) % 6), 1 if i % 2 else 2)
               for i in range(6)],
        charges=np.zeros(6, int), aromatic=np.ones(6, bool))
    assert scoring.logp(benzene) == pytest.approx(1.6866, abs=0.01)


def test_qed_bounded_and_lead_like(mols):
    """QED is a weighted geometric mean of [0,1] desirabilities, so it
    must be <= 1 everywhere (the cap regression-tests the ADS>dmax
    parameter-rounding artifact). MOSES compounds are lead-like: the mean
    must land in the published high-QED band. ALERTS is approximated as 0,
    which is near-truth for MOSES (MCF+PAINS-filtered) and biases QED
    slightly UP elsewhere — documented."""
    qd = np.array([scoring.qed(m) for m in mols])
    assert qd.max() <= 1.0 + 1e-9
    assert qd.min() > 0.0
    assert 0.65 <= qd.mean() <= 0.90, float(qd.mean())


def test_sa_exact_band(mols):
    """The SA score is EXACT (bit-exact Morgan hashing + the vendored
    Ertl fragment DB): the shipped set's mean must sit in the known
    MOSES normalized-SA band."""
    sa = np.array([scoring.sa_score(m) for m in mols])
    assert 0.75 <= sa.mean() <= 0.85, float(sa.mean())
    assert sa.min() > 0.4
