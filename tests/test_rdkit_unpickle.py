"""RDKit binary Mol reader: parse the reference's shipped MOSES2 test set
without RDKit or torch, and cross-validate our chem arithmetic against the
numbers RDKit itself serialized into the blobs."""
import os

import numpy as np
import pytest

from shapemol_tpu.compat.rdkit_unpickle import (load_index_map,
                                                load_rdkit_mol_pickle,
                                                parse_mol_binary)
from shapemol_tpu.chem.mol import ring_basis
from shapemol_tpu.eval import scoring

TEST_PKL = "/root/reference/data/MOSES2_test_mol.pkl"
INDEX_MAP = "/root/reference/data/index_map.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(TEST_PKL),
                                reason="reference test set not mounted")


@pytest.fixture(scope="module")
def testset():
    return load_rdkit_mol_pickle(TEST_PKL)


def test_full_testset_parses(testset):
    assert len(testset) == 1000
    for m in testset:
        assert 0 < m.num_atoms <= 40
        assert m.pos.shape == (m.num_atoms, 3)
        assert len(m.bonds) >= m.num_atoms - 1        # connected molecules
        # MOSES vocabulary: C N O F S Cl Br only, all neutral
        assert set(m.atomic_nums.tolist()) <= {6, 7, 8, 9, 16, 17, 35}
        assert (m.charges == 0).all()


def test_h_counts_match_rdkit(testset):
    """Our valence->H arithmetic must reproduce RDKit's totalNumHs on every
    atom of the real test set (calibrates QED/SA/donor counting)."""
    for m in testset:
        ours = scoring.implicit_h_counts(m)
        np.testing.assert_array_equal(ours, m.rdkit_total_h)


def test_ring_perception_matches_rdkit(testset):
    """Our SSSR-ish cycle basis must agree with RDKit's ring info on ring
    membership and ring-size multiset for nearly all molecules."""
    mismatch = 0
    for m in testset:
        ours = sorted(len(r) for r in ring_basis(m))
        rdkit = sorted(len(r) for r in m.rdkit_rings)
        if ours != rdkit:
            mismatch += 1
    # SSSR is not unique; allow a small disagreement tail
    assert mismatch <= 20, f"{mismatch}/1000 ring-basis mismatches"


def test_aromatic_flags_consistent(testset):
    """Atoms flagged aromatic must sit on aromatic bonds and vice versa."""
    for m in testset:
        on_aromatic_bond = np.zeros(m.num_atoms, bool)
        for i, j, o in m.bonds:
            if o == 4:
                on_aromatic_bond[i] = on_aromatic_bond[j] = True
        np.testing.assert_array_equal(on_aromatic_bond, m.aromatic)


def test_index_map():
    idx = load_index_map(INDEX_MAP)
    assert len(idx) == 1000
    assert set(idx.keys()) == set(range(1000))
    assert all(0 <= v < 1000 for v in idx.values())


def test_reject_garbage():
    with pytest.raises(ValueError):
        parse_mol_binary(b"\x00" * 64)
    with pytest.raises(ValueError):
        parse_mol_binary(b"\xef\xbe\xad\xde" + b"\x01" * 64)
