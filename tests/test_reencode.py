"""reencode_packs CLI: refreshes shape_emb in place from stored clouds."""
import sys

import numpy as np

from shapemol_tpu.data.packs import MoleculeRecord, write_pack


def test_reencode_packs_in_place(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    records = []
    for k in range(5):
        n = int(rng.integers(4, 9))
        records.append(MoleculeRecord(
            pos=rng.standard_normal((n, 3)).astype(np.float32),
            v=rng.integers(0, 8, n).astype(np.int32),
            shape_emb=np.zeros((6, 3), np.float32),
            bounds=rng.standard_normal((3, 2)).astype(np.float32),
            cloud=rng.standard_normal((32, 3)).astype(np.float32),
            smiles=f"C{k}"))
    pack = tmp_path / "toy_v1.shard000_00000.npz"
    write_pack(str(pack), records, n_max=12)

    def fake_loader(ckpt, logger):
        # deterministic "encoder": mean of the cloud, tiled to (6, 3)
        def enc(clouds):
            m = np.asarray(clouds).mean(axis=1, keepdims=True)
            return np.repeat(m, 6, axis=1)
        return enc

    from shapemol_tpu.cli import train_diffusion
    monkeypatch.setattr(train_diffusion, "load_shape_encoder", fake_loader)
    from shapemol_tpu.cli import reencode_packs
    monkeypatch.setattr(sys, "argv", [
        "reencode_packs", "--pack", str(pack), "--shape_ckpt", "dummy",
        "--batch_size", "4"])
    reencode_packs.main()

    with np.load(pack) as z:
        emb = z["shape_emb"]
        clouds = z["cloud"]
        pos = z["pos"]
    assert emb.shape == (5, 6, 3)
    expect = clouds.mean(axis=1, keepdims=True).repeat(6, axis=1)
    np.testing.assert_allclose(emb, expect, rtol=1e-6)
    # everything else untouched
    np.testing.assert_array_equal(pos[0, :len(records[0].v)], records[0].pos)
