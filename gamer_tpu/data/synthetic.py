"""Synthetic dataset generator for the full data contract.

The reference repo ships its datasets as git-LFS stubs (no content), so this
framework provides a deterministic generator that emits every file type of the
contract (ref: docs/datasets.md) with learnable structure:

 * items live in latent clusters; users prefer a few clusters — so a real model
   beats the rule-based baseline and metrics move during training;
 * semantic IDs are derived from cluster structure (first level ~ cluster), so
   RQ-VAE-style hierarchical codes are realistic;
 * SMB sessions group consecutive interactions; behaviors are sampled with
   level-dependent frequency (low-level behaviors frequent, target behavior rare),
   matching the multi-behavior shape the GAMER recipes assume.

Used by tests (as the Toy-dataset analog) and by bench.py for load generation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np

from gamer_tpu.data.contract import DataFiles


@dataclass
class SyntheticSpec:
    n_users: int = 64
    n_items: int = 200
    n_clusters: int = 8
    # interactions per user ~ uniform[min_len, max_len]
    min_len: int = 8
    max_len: int = 40
    # semantic-ID structure
    num_levels: int = 4
    level_sizes: tuple[int, ...] = (32, 32, 32, 32)
    # behaviors, ordered low level -> high level; last one is the target
    behaviors: tuple[str, ...] = ("click", "cart", "buy")
    behavior_freq: tuple[float, ...] = (0.6, 0.25, 0.15)
    # sessions: expected interactions per session
    session_len: int = 4
    min_sessions: int = 3
    emb_dim: int = 64
    seed: int = 0


@dataclass
class SyntheticData:
    spec: SyntheticSpec
    inters: dict[str, list[int]] = field(default_factory=dict)
    behaviors: dict[str, list[str]] = field(default_factory=dict)
    sessions: dict[str, list[int]] = field(default_factory=dict)
    times: dict[str, list[str]] = field(default_factory=dict)
    indices: dict[str, list[str]] = field(default_factory=dict)
    behavior_level: dict[str, int] = field(default_factory=dict)
    item_meta: dict[str, dict] = field(default_factory=dict)
    embeddings: np.ndarray | None = None

    def write(self, data_path: str, dataset: str, plm: str = "synthetic") -> DataFiles:
        files = DataFiles(data_path, dataset)
        files.save_inter(self.inters)
        files.save_item_meta(self.item_meta)
        files.save_index(self.indices)
        files.save_behavior_level(self.behavior_level)
        files.save_mb(self.inters, self.behaviors)
        files.save_smb(self.inters, self.behaviors, self.sessions, self.times)
        if self.embeddings is not None:
            files.save_embeddings(self.embeddings, plm=plm)
        return files


def generate(spec: SyntheticSpec | None = None) -> SyntheticData:
    spec = spec or SyntheticSpec()
    rng = np.random.default_rng(spec.seed)
    data = SyntheticData(spec=spec)

    # Behavior levels 1..K with the unique max = target behavior.
    data.behavior_level = {b: i + 1 for i, b in enumerate(spec.behaviors)}

    # Latent structure: cluster centers + items.
    centers = rng.normal(size=(spec.n_clusters, spec.emb_dim))
    item_cluster = rng.integers(0, spec.n_clusters, size=spec.n_items)
    item_emb = centers[item_cluster] + 0.3 * rng.normal(size=(spec.n_items, spec.emb_dim))
    data.embeddings = item_emb.astype(np.float32)
    data.item_meta = {
        str(i): {"title": f"item {i}", "category": f"c{item_cluster[i]}"} for i in range(spec.n_items)
    }

    # Semantic IDs: level 0 follows the cluster (hierarchical signal), deeper
    # levels random; regenerate duplicated full codes until unique.
    codes = np.zeros((spec.n_items, spec.num_levels), dtype=np.int64)
    codes[:, 0] = item_cluster % spec.level_sizes[0]
    for l in range(1, spec.num_levels):
        codes[:, l] = rng.integers(0, spec.level_sizes[l], size=spec.n_items)
    seen: dict[bytes, int] = {}
    for i in range(spec.n_items):
        for _ in range(64):
            key = codes[i].tobytes()
            if key not in seen:
                seen[key] = i
                break
            codes[i, -1] = rng.integers(0, spec.level_sizes[-1])
    data.indices = {
        str(i): [f"<{chr(ord('a') + l)}_{codes[i, l]}>" for l in range(spec.num_levels)]
        for i in range(spec.n_items)
    }

    # Users: preference over clusters -> item sampling weights.
    behavior_freq = np.asarray(spec.behavior_freq, dtype=np.float64)
    behavior_freq = behavior_freq / behavior_freq.sum()
    base_time = datetime(2024, 1, 1, 12, 0, 0)
    for u in range(spec.n_users):
        pref = rng.dirichlet(np.full(spec.n_clusters, 0.3))
        item_w = pref[item_cluster] + 1e-4
        item_w = item_w / item_w.sum()
        n = int(rng.integers(spec.min_len, spec.max_len + 1))
        # At least min_sessions sessions so train/valid/test session split works.
        n_sessions = max(spec.min_sessions, int(np.ceil(n / spec.session_len)))
        n = max(n, n_sessions)  # at least one event per session
        items = rng.choice(spec.n_items, size=n, p=item_w, replace=True).tolist()
        behs = rng.choice(len(spec.behaviors), size=n, p=behavior_freq)
        # every session ends with a target-behavior event so each split has targets
        bounds = np.sort(rng.choice(np.arange(1, n), size=n_sessions - 1, replace=False)) if n_sessions > 1 else np.array([], dtype=int)
        session_ids = np.zeros(n, dtype=np.int64)
        for b in bounds:
            session_ids[b:] += 1
        for s_end in list(bounds - 1) + [n - 1]:
            behs[s_end] = len(spec.behaviors) - 1
        t = base_time + timedelta(hours=int(rng.integers(0, 24 * 90)))
        times = []
        for s in session_ids:
            t = t + timedelta(minutes=int(rng.integers(1, 40)) + int(s) * 7)
            times.append(t.strftime("%Y-%m-%d %H:%M:%S"))
        uid = str(u)
        data.inters[uid] = items
        data.behaviors[uid] = [spec.behaviors[int(b)] for b in behs]
        data.sessions[uid] = session_ids.tolist()
        data.times[uid] = times
    return data


def write_synthetic_dataset(data_path: str, dataset: str = "Synth", spec: SyntheticSpec | None = None) -> DataFiles:
    return generate(spec).write(data_path, dataset)
