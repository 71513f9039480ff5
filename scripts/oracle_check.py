#!/usr/bin/env python
"""Measure the learnable headroom of a synthetic corpus geometry.

For a candidate SyntheticSpec, compute next-item hit@10 of
  * the TRUE ORACLE — scores items with the generator's own latent mixture
    (successor graph + within-cluster Zipf + history-estimated preference);
  * the RULE floor — repeat-history frequency ranking (what test_SMB_rule does).

Used before committing hours of training to a geometry: if oracle ~= rule, no
sequence model can show an ordering on that corpus (the round-2 v1-corpus
negative result, docs/benchmarks.md). Ref analog: the reference assumes real
datasets with sequential signal; our generator must be validated to have it.

Usage: python scripts/oracle_check.py [--users 2500 --items 2000 ...]
"""
from __future__ import annotations

import argparse

import numpy as np

from gamer_tpu.data.synthetic import SyntheticSpec, generate


def headroom(spec: SyntheticSpec, topk: int = 10) -> dict:
    data = generate(spec)
    lat = data.latent
    item_cluster = lat["item_cluster"]
    succ = lat.get("succ")
    cluster_items = lat.get("cluster_items")
    pop_cdf = lat.get("pop_cdf")
    n_items = spec.n_items
    denom = max(len(spec.behaviors) - 1, 1)
    level_of = {b: i for i, b in enumerate(spec.behaviors)}

    # per-cluster item probability vectors (Zipf over the cluster's items)
    item_p = np.zeros((spec.n_clusters, n_items))
    for c in range(spec.n_clusters):
        idx = cluster_items[c] if cluster_items is not None else \
            np.flatnonzero(item_cluster == c)
        if len(idx) == 0:
            continue
        if pop_cdf is not None:
            p = np.diff(np.concatenate([[0.0], pop_cdf[c]]))
        else:
            p = np.full(len(idx), 1.0 / len(idx))
        item_p[c, idx] = p

    oracle_hits = rule_hits = n_eval = 0
    for u in range(spec.n_users):
        seq = data.inters[str(u)]
        behs = data.behaviors[str(u)]
        if len(seq) < 4:
            continue
        hist, target = seq[:-1], seq[-1]
        prev_item, prev_beh = hist[-1], behs[-2]
        # oracle: mixture of successor-transition and history-estimated pref
        lvl = level_of[prev_beh] / denom
        eff = float(np.clip(spec.cluster_stickiness
                            + spec.behavior_stickiness_gain * (lvl - 0.5),
                            0.0, 1.0))
        scores = np.zeros(n_items)
        if succ is not None and eff > 0.0:
            for sc in succ[item_cluster[prev_item]]:
                scores += (eff / spec.succ_per_cluster) * item_p[sc]
        # preference estimated from the user's observed history clusters
        hc = np.bincount(item_cluster[np.asarray(hist)],
                         minlength=spec.n_clusters).astype(np.float64)
        hc /= hc.sum()
        scores += (1.0 - eff) * (hc @ item_p)
        if target in np.argpartition(-scores, topk)[:topk]:
            oracle_hits += 1
        # rule floor: most-frequent history items (recency-free approximation)
        vals, counts = np.unique(hist, return_counts=True)
        top = vals[np.argsort(-counts)][:topk]
        if target in top:
            rule_hits += 1
        n_eval += 1

    return {"oracle_hit@10": oracle_hits / n_eval,
            "rule_hit@10": rule_hits / n_eval, "n_eval": n_eval}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=2500)
    ap.add_argument("--items", type=int, default=2000)
    ap.add_argument("--clusters", type=int, default=48)
    ap.add_argument("--min_len", type=int, default=16)
    ap.add_argument("--max_len", type=int, default=60)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--stickiness", type=float, default=0.6)
    ap.add_argument("--pop_alpha", type=float, default=1.0)
    ap.add_argument("--beh_gain", type=float, default=0.4)
    a = ap.parse_args()
    spec = SyntheticSpec(
        n_users=a.users, n_items=a.items, n_clusters=a.clusters,
        min_len=a.min_len, max_len=a.max_len, num_levels=4,
        level_sizes=(64, 64, 64, 64), behaviors=("click", "cart", "buy"),
        behavior_freq=(0.6, 0.25, 0.15), session_len=5, min_sessions=4,
        emb_dim=128, seed=a.seed, cluster_stickiness=a.stickiness,
        succ_per_cluster=3, item_pop_alpha=a.pop_alpha,
        behavior_stickiness_gain=a.beh_gain)
    r = headroom(spec)
    print({"geometry": f"{a.users}u/{a.items}i/{a.clusters}c", **r,
           "headroom": r["oracle_hit@10"] / max(r["rule_hit@10"], 1e-9)})


if __name__ == "__main__":
    main()
