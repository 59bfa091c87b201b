"""Bucketed, padded batching for molecule graphs — the TPU-native
replacement for PyG's ragged concat-batching (datasets/shape_mol_data.py
FOLLOW_BATCH + torch_geometric DataLoader in scripts/train_diffusion.py:100).

Molecules are grouped into atom-count buckets (each bucket = one static
padded shape = one XLA compilation); batches are dense slices with masks.
Includes the RandomRotation augmentation (utils/transforms.py:172-182)."""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from shapemol_tpu.data.packs import PackDataset

DEFAULT_BUCKETS = (16, 24, 32, 48, 64)


def bucket_of(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def random_rotation_matrix(rng: np.random.Generator) -> np.ndarray:
    m = rng.standard_normal((3, 3))
    q, r = np.linalg.qr(m)
    return (q * np.sign(np.diag(r))).astype(np.float32)


@dataclasses.dataclass
class BucketBatcher:
    """Infinite shuffled batches of fixed shape per bucket."""
    dataset: PackDataset
    batch_size: int
    buckets: Sequence[int] = DEFAULT_BUCKETS
    random_rotate: bool = False
    pos_jitter: float = 0.0        # Gaussian sigma (Å) added to training
                                   # coordinates — data-smoothing
                                   # augmentation probe (r4); the shape
                                   # embedding/cloud stay un-jittered so
                                   # conditioning still describes the
                                   # clean molecule
    seed: int = 0
    drop_oversize: bool = True
    indices: Optional[np.ndarray] = None     # restrict to a split
    # per-dataset-index sampling weights (len == len(dataset)). Lets a
    # small real corpus keep a fixed expected share of every batch when
    # globbed together with a much larger self-distillation pack
    # (importance-weighted corpus mixing); None = uniform.
    sample_weights: Optional[np.ndarray] = None
    # multi-host: every process runs the SAME rng stream (identical bucket
    # choice -> identical static shapes across hosts) but gathers only its
    # own batch_size/process_count rows
    process_index: int = 0
    process_count: int = 1

    def __post_init__(self):
        counts = self.dataset.num_atoms()
        pool = (np.arange(len(counts)) if self.indices is None
                else np.asarray(self.indices))
        counts = counts[pool]
        self._by_bucket: Dict[int, np.ndarray] = {}
        for b in self.buckets:
            lo = 0 if b == self.buckets[0] else \
                self.buckets[self.buckets.index(b) - 1]
            sel = pool[np.where((counts > lo) & (counts <= b))[0]]
            if len(sel):
                self._by_bucket[b] = sel
        if not self.drop_oversize:
            over = np.where(counts > self.buckets[-1])[0]
            if len(over):
                raise ValueError(f"{len(over)} molecules exceed the largest "
                                 f"bucket {self.buckets[-1]}")

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        bucket_keys = list(self._by_bucket)
        if self.sample_weights is not None:
            w_all = np.asarray(self.sample_weights, dtype=np.float64)
            if w_all.shape[0] != len(self.dataset):
                raise ValueError(
                    f"sample_weights has {w_all.shape[0]} entries for a "
                    f"{len(self.dataset)}-molecule dataset")
            per_bucket_p = {b: w_all[sel] / max(w_all[sel].sum(), 1e-30)
                            for b, sel in self._by_bucket.items()}
            weights = np.array([w_all[self._by_bucket[b]].sum()
                                for b in bucket_keys], dtype=np.float64)
        else:
            per_bucket_p = {b: None for b in self._by_bucket}
            weights = np.array([len(self._by_bucket[b]) for b in bucket_keys],
                               dtype=np.float64)
        weights /= weights.sum()
        while True:
            b = bucket_keys[rng.choice(len(bucket_keys), p=weights)]
            pool = self._by_bucket[b]
            p = per_bucket_p[b]
            # weighted draws are with-replacement: a high-weight corpus is
            # *supposed* to repeat within a batch when it is tiny
            idxs = rng.choice(pool, size=self.batch_size, p=p,
                              replace=(p is not None
                                       or len(pool) < self.batch_size))
            yield self._make_batch(idxs, b, rng)

    def _make_batch(self, idxs, bucket: int, rng) -> Dict[str, np.ndarray]:
        if self.process_count > 1:
            local = len(idxs) // self.process_count
            idxs = idxs[self.process_index * local:
                        (self.process_index + 1) * local]
        batch = self.dataset.gather(idxs)
        batch = {k: v[:, :bucket] if v.ndim >= 2 and k in
                 ("pos", "v", "node_mask") else v
                 for k, v in batch.items()}
        if self.random_rotate:
            R = random_rotation_matrix(rng)
            batch["pos"] = batch["pos"] @ R
            if "shape_emb" in batch:
                batch["shape_emb"] = batch["shape_emb"] @ R
            if "cloud" in batch:
                batch["cloud"] = batch["cloud"] @ R
        if self.pos_jitter > 0:
            batch["pos"] = batch["pos"] + rng.normal(
                0.0, self.pos_jitter, batch["pos"].shape).astype(
                    batch["pos"].dtype)
        return batch

    def fixed_batches(self, n_batches: int, seed: int = 1
                      ) -> List[Dict[str, np.ndarray]]:
        """Deterministic validation batches."""
        rng = np.random.default_rng(seed)
        it = iter(dataclasses.replace(self, seed=seed, random_rotate=False,
                                      pos_jitter=0.0))
        return [next(it) for _ in range(n_batches)]


def split_moses2(n: int, n_val: int = 1000, seed: int = 2023,
                 with_replacement: bool = True):
    """Train/val split. The reference draws val indices WITH replacement
    (np.random.choice default — SURVEY Q5); kept as the default for
    behavioral parity, switchable to a sane sample without replacement.
    For datasets smaller than 10x n_val the val size shrinks to n // 10."""
    n_val = min(n_val, max(n // 10, 1))
    rng = np.random.RandomState(seed)
    val = rng.choice(n, n_val, replace=with_replacement)
    val_set = set(val.tolist())
    train = np.array([i for i in range(n) if i not in val_set])
    return {"train": train, "val": np.asarray(sorted(val_set))}
