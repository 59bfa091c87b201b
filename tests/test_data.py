"""Data pipeline tests: packs, bucketing, splits, preprocessing, synthetic
generator, atom prior."""
import numpy as np
import pytest

from shapemol_tpu.data.packs import MoleculeRecord, PackDataset, write_pack
from shapemol_tpu.data.batching import (BucketBatcher, bucket_of,
                                        split_moses2)
from shapemol_tpu.data.preprocess import (preprocess_molecules,
                                          preprocess_shape_dataset,
                                          ShapePackDataset,
                                          featurize_molecule)
from shapemol_tpu.data.synthetic import random_dataset
from shapemol_tpu.sample.atom_prior import AtomNumPrior, build_atomnum_prior


@pytest.fixture(scope="module")
def mols():
    return random_dataset(12, seed=3)


def _records(n=20, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    for _ in range(n):
        k = int(rng.integers(5, 30))
        recs.append(MoleculeRecord(
            pos=rng.standard_normal((k, 3)).astype(np.float32),
            v=rng.integers(0, 15, k).astype(np.int32),
            shape_emb=rng.standard_normal((32, 3)).astype(np.float32),
            bounds=rng.standard_normal((3, 2)).astype(np.float32),
            smiles=f"mol{_}"))
    return recs


def test_pack_roundtrip(tmp_path):
    recs = _records()
    path = str(tmp_path / "pack.npz")
    write_pack(path, recs, n_max=32)
    ds = PackDataset(path)
    assert len(ds) == 20
    item = ds[3]
    n = len(recs[3].v)
    np.testing.assert_allclose(item["pos"][:n], recs[3].pos, atol=1e-6)
    assert item["node_mask"][:n].all() and not item["node_mask"][n:].any()
    np.testing.assert_array_equal(ds.num_atoms(),
                                  [len(r.v) for r in recs])


def test_pack_multi_shard(tmp_path):
    write_pack(str(tmp_path / "p.shard000.npz"), _records(5, 1), n_max=32)
    write_pack(str(tmp_path / "p.shard001.npz"), _records(7, 2), n_max=32)
    ds = PackDataset(str(tmp_path / "p.shard*.npz"))
    assert len(ds) == 12
    batch = ds.gather([0, 6, 11])
    assert batch["pos"].shape == (3, 32, 3)


def test_bucket_batcher(tmp_path):
    path = str(tmp_path / "pack.npz")
    write_pack(path, _records(50, 4), n_max=32)
    ds = PackDataset(path)
    b = BucketBatcher(ds, batch_size=8, buckets=(16, 24, 32), seed=0)
    it = iter(b)
    seen_shapes = set()
    for _ in range(10):
        batch = next(it)
        B, N = batch["pos"].shape[:2]
        assert B == 8 and N in (16, 24, 32)
        seen_shapes.add(N)
        # every molecule fits its bucket
        assert batch["node_mask"].sum(1).max() <= N
    assert len(seen_shapes) >= 1


def test_bucket_batcher_split_restriction(tmp_path):
    path = str(tmp_path / "pack.npz")
    write_pack(path, _records(40, 5), n_max=32)
    ds = PackDataset(path)
    idx = np.arange(10)
    b = BucketBatcher(ds, batch_size=4, indices=idx, seed=0)
    pool = np.concatenate([v for v in b._by_bucket.values()])
    assert set(pool.tolist()) <= set(idx.tolist())


def test_random_rotation_augment(tmp_path):
    path = str(tmp_path / "pack.npz")
    write_pack(path, _records(10, 6), n_max=32)
    ds = PackDataset(path)
    b1 = BucketBatcher(ds, 4, seed=1, random_rotate=False)
    b2 = BucketBatcher(ds, 4, seed=1, random_rotate=True)
    x1, x2 = next(iter(b1)), next(iter(b2))
    # same molecules drawn, rotated coordinates: norms preserved
    n1 = np.linalg.norm(x1["pos"], axis=-1)
    n2 = np.linalg.norm(x2["pos"], axis=-1)
    np.testing.assert_allclose(n1, n2, atol=1e-4)
    assert not np.allclose(x1["pos"], x2["pos"])


def test_pos_jitter_augment(tmp_path):
    path = str(tmp_path / "pack.npz")
    write_pack(path, _records(10, 6), n_max=32)
    ds = PackDataset(path)
    b1 = BucketBatcher(ds, 4, seed=1, pos_jitter=0.0)
    b2 = BucketBatcher(ds, 4, seed=1, pos_jitter=0.05)
    x1, x2 = next(iter(b1)), next(iter(b2))
    d = x2["pos"] - x1["pos"]
    assert not np.allclose(d, 0)
    assert np.abs(d).max() < 0.05 * 6          # bounded by ~6 sigma
    # validation batches must stay un-jittered
    f1 = b1.fixed_batches(2, seed=7)
    f2 = b2.fixed_batches(2, seed=7)
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(a["pos"], b["pos"])


def test_split_moses2():
    s = split_moses2(100000)
    assert len(s["val"]) <= 1000
    assert len(set(s["val"]) & set(s["train"])) == 0
    # small dataset: val shrinks
    s = split_moses2(50)
    assert 1 <= len(s["val"]) <= 5
    assert len(s["train"]) >= 40


def test_bucket_of():
    assert bucket_of(10) == 16
    assert bucket_of(17) == 24
    assert bucket_of(100) == 64


def test_featurize_and_preprocess(tmp_path, mols):
    v = featurize_molecule(mols[0])
    assert v is not None and v.dtype == np.int32
    assert (v >= 0).all() and (v < 15).all()

    def dummy_encoder(clouds):
        return clouds[:, :32, :] * 0.1

    paths = preprocess_molecules(mols, str(tmp_path / "sm"),
                                 encoder_fn=dummy_encoder,
                                 point_cloud_samples=64, n_max=64,
                                 keep_cloud=True)
    assert paths
    ds = PackDataset(str(tmp_path / "sm") + ".*.npz")
    assert len(ds) >= 10
    assert "shape_emb" in ds.keys() and "bounds" in ds.keys()
    item = ds[0]
    assert item["shape_emb"].shape == (32, 3)
    assert item["cloud"].shape == (64, 3)


def test_preprocess_shape_dataset(tmp_path, mols):
    paths = preprocess_shape_dataset(mols[:4], str(tmp_path / "shape"),
                                     point_cloud_samples=64, num_query=128)
    assert paths
    ds = ShapePackDataset(str(tmp_path / "shape") + ".*.npz")
    assert len(ds) >= 3
    batch = ds.batch([0, 1], point_batch_size=32,
                     rng=np.random.default_rng(0))
    assert batch["point_cloud"].shape == (2, 64, 3)
    assert batch["query_points"].shape == (2, 32, 3)
    assert batch["values"].shape == (2, 32)
    # signed distances must have both signs overall
    assert (batch["values"] < 0).any() and (batch["values"] > 0).any()


def test_synthetic_molecules(mols):
    for m in mols:
        assert m.num_atoms >= 6
        assert m.is_connected()
        d = np.linalg.norm(m.pos[:, None] - m.pos[None], axis=-1)
        np.fill_diagonal(d, 10)
        assert d.min() > 1.0          # no clashes


def test_atom_prior_roundtrip(tmp_path, mols):
    prior = build_atomnum_prior(mols[:6])
    path = str(tmp_path / "prior.pkl")
    prior.save(path)
    p2 = AtomNumPrior.load(path)
    key = sorted(p2.table)[0]
    ns, ps = p2.distribution(key)
    np.testing.assert_allclose(ps.sum(), 1.0)
    samples = p2.sample(key, 100, np.random.default_rng(0))
    assert set(samples) <= set(ns.tolist())
    # far-away voxel count falls back to the global marginal
    ns2, ps2 = p2.distribution(10 ** 9)
    assert len(ns2) >= 1


def test_reference_atomnum_prior_loads():
    """The reference ships this prior as plain-Python pickle — our loader
    must read it directly (scripts/sample_diffusion.py:218)."""
    import os
    path = "/root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl"
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    prior = AtomNumPrior.load(path)
    assert len(prior.table) > 1000
    ns, ps = prior.distribution(sorted(prior.table)[len(prior.table) // 2])
    np.testing.assert_allclose(ps.sum(), 1.0)
    assert (ns > 0).all() and (ns < 60).all()


def test_pack_mixed_conditioning_guard(tmp_path):
    """A glob that sweeps up re-encoded variants (different shape_emb
    widths) of the same pack must fail loudly, not silently duplicate
    molecules (round-3 regression: *_voxel/*_dual packs live next to the
    base shards)."""
    import numpy as np
    import pytest
    from shapemol_tpu.data.packs import PackDataset
    base = dict(pos=np.zeros((4, 8, 3), np.float32),
                v=np.zeros((4, 8), np.int32),
                node_mask=np.ones((4, 8), bool),
                shape_emb=np.zeros((4, 32, 3), np.float32))
    np.savez(tmp_path / "p.shard000.npz", **base)
    base["shape_emb"] = np.zeros((4, 64, 3), np.float32)
    np.savez(tmp_path / "p.shard000_dual.npz", **base)
    with pytest.raises(ValueError, match="shape_emb"):
        PackDataset(str(tmp_path / "p.*.npz"))
    assert len(PackDataset(str(tmp_path / "p.shard000.npz"))) == 4


def test_build_guidance_cloud():
    """Shared cloud builder (sample/clouds.py): deterministic, padded to
    max_atoms*20 with far dummies, SystemExit on oversized targets."""
    import pytest
    from shapemol_tpu.sample.clouds import build_guidance_cloud
    ref = np.random.default_rng(3).standard_normal((7, 3)).astype(np.float32)
    c1 = build_guidance_cloud(ref, 10, seed=42, target_id=0)
    c2 = build_guidance_cloud(ref, 10, seed=42, target_id=0)
    assert c1.shape == (200, 3) and c1.dtype == np.float32
    np.testing.assert_array_equal(c1, c2)
    assert (c1[:140] < 1e5).all()            # real points near the atoms
    assert (c1[140:] == 1e6).all()           # pad rows are far dummies
    with pytest.raises(SystemExit):
        build_guidance_cloud(ref, 6, seed=0, target_id=9)


def test_pack_multi_pattern(tmp_path):
    """Comma-separated pack patterns train on multiple corpora at once."""
    write_pack(str(tmp_path / "a.shard000.npz"), _records(5, 1), n_max=32)
    write_pack(str(tmp_path / "b.shard000.npz"), _records(7, 2), n_max=32)
    ds = PackDataset(f"{tmp_path}/a.*.npz, {tmp_path}/b.*.npz")
    assert len(ds) == 12
    # single path (no glob) still works through the same code path
    ds1 = PackDataset(str(tmp_path / "a.shard000.npz"))
    assert len(ds1) == 5


def test_build_dataset_multi_pattern_no_spurious_preprocess(tmp_path):
    """cli.train_diffusion.build_dataset must resolve comma-joined
    multi-corpus patterns part-by-part: when every part exists it loads
    them directly (a naive glob of the joined string is always empty and
    used to trigger a full spurious re-preprocess into a junk prefix);
    when a part is missing it fails loudly instead of preprocessing."""
    import logging
    from shapemol_tpu.cli.train_diffusion import build_dataset
    from shapemol_tpu.core.config import AttrDict

    write_pack(str(tmp_path / "a.shard000.npz"), _records(5, 1), n_max=32)
    write_pack(str(tmp_path / "b.shard000.npz"), _records(7, 2), n_max=32)
    logger = logging.getLogger("test")

    cfg = AttrDict.convert(
        {"data": {"pack_pattern": f"{tmp_path}/a.*.npz, {tmp_path}/b.*.npz"}})
    ds = build_dataset(cfg, object(), logger)  # args untouched on this path
    assert len(ds) == 12

    cfg_missing = AttrDict.convert(
        {"data": {"pack_pattern":
                  f"{tmp_path}/a.*.npz, {tmp_path}/missing.*.npz"}})
    with pytest.raises(SystemExit, match="unresolved parts"):
        build_dataset(cfg_missing, object(), logger)


def test_weighted_corpus_mixing(tmp_path):
    """sample_weights keeps a tiny 'real' pack at a fixed expected batch
    share when globbed with a large synthetic pack (the distillation-mix
    dial in cli/train_diffusion.py data.real_mix)."""
    # tag each corpus through the v channel so drawn molecules are
    # identifiable inside a yielded batch (real: v==14, synthetic: v==3)
    def tagged(n, seed, tag):
        recs = _records(n, seed)
        for r in recs:
            r.v[:] = tag
        return recs

    real = str(tmp_path / "real.shard000.npz")
    syn = str(tmp_path / "distill.shard000.npz")
    write_pack(real, tagged(10, 1, 14), n_max=32)
    write_pack(syn, tagged(90, 2, 3), n_max=32)
    ds = PackDataset(f"{real},{syn}")
    real_idx = ds.indices_from("real.shard")
    assert len(real_idx) == 10
    assert ds.indices_from("nope.shard").shape == (0,)

    frac = 0.5
    n_syn = len(ds) - len(real_idx)
    w = np.ones(len(ds))
    w[real_idx] = (frac / (1 - frac)) * (n_syn / len(real_idx))

    def real_share(batcher, n_batches=150):
        it = iter(batcher)
        hits = tot = 0
        for _ in range(n_batches):
            batch = next(it)
            first_atom = batch["v"][:, 0]       # every row 0 is a real atom
            hits += int((first_atom == 14).sum())
            tot += first_atom.shape[0]
        return hits / tot

    got = real_share(BucketBatcher(ds, batch_size=16, buckets=(32,),
                                   seed=3, sample_weights=w))
    assert abs(got - frac) < 0.04, got

    # uniform (no weights) leaves the real share at the corpus-size ratio
    got_u = real_share(BucketBatcher(ds, batch_size=16, buckets=(32,),
                                     seed=3))
    assert abs(got_u - 0.1) < 0.04, got_u

    # multi-bucket: the marginal share still holds when molecules split
    # across size buckets (production configs bucket by atom count, so the
    # bucket-selection weights must aggregate sample_weights per bucket)
    got_mb = real_share(BucketBatcher(ds, batch_size=16, buckets=(16, 32),
                                      seed=5, sample_weights=w))
    assert abs(got_mb - frac) < 0.05, got_mb
