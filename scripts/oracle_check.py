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


def headroom_v3(spec: SyntheticSpec, topk: int = 10) -> dict:
    """Action-conditional headroom of a v3 corpus (VERDICT r4 #1 prong a).

    Evaluates hit@10 on the TARGET-level events of each user's HELD-OUT last
    session, using only prompt information (events before the last session —
    the exact eval protocol of build_session_eval_examples):

      aware  — pools the previous session's CART-level events (needs action
               levels), majority cluster -> P -> rank the mapped target
               cluster's items by popularity; the generator's own rule.
      blind  — same aggregate but over ALL lower-level events of the previous
               session (cannot condition on action level, so the click noise
               votes too). The aware/blind gap IS the action-conditional
               signal a causal-only model must synthesize attention to close.
      rule   — repeat-history floor (top-k most frequent prompt items), what
               test_SMB_rule computes.
      rule_reserved — rule restricted to reserved (target-able) items: the
               strongest behavior-aware static floor.
    """
    data = generate(spec)
    lat = data.latent
    item_cluster = lat["item_cluster"]
    v3 = lat["v3"]
    P, pop_cdf, cluster_items = v3["P"], v3["pop_cdf"], v3["cluster_items"]
    n_content = v3["n_content"]
    K = len(spec.behaviors)
    level_of = {b: i for i, b in enumerate(spec.behaviors)}

    def top_items(c, k):
        idx = cluster_items[c]
        p = np.diff(np.concatenate([[0.0], pop_cdf[c]]))
        return idx[np.argsort(-p)][:k]

    hits = {"aware": 0, "blind": 0, "rule": 0, "rule_reserved": 0}
    n_eval = 0
    for u in range(spec.n_users):
        seq = np.asarray(data.inters[str(u)])
        behs = np.asarray([level_of[b] for b in data.behaviors[str(u)]])
        sids = np.asarray(data.sessions[str(u)])
        last_s = sids[-1]
        cut = int(np.argmax(sids == last_s))
        tgt = seq[cut:][behs[cut:] == K - 1]
        if len(tgt) == 0 or cut == 0:
            continue
        prompt, pbehs, psids = seq[:cut], behs[:cut], sids[:cut]
        prev_mask = psids == (last_s - 1)
        carts = prompt[prev_mask & (pbehs == K - 2)]
        lowers = prompt[prev_mask & (pbehs < K - 1)]

        def agg_pred(events):
            cl = item_cluster[events]
            cl = cl[cl < n_content]
            if len(cl) == 0:
                return None
            m = int(np.bincount(cl).argmax())
            return set(top_items(int(P[m]), topk).tolist())

        aware = agg_pred(carts)
        blind = agg_pred(lowers)
        vals, counts = np.unique(prompt, return_counts=True)
        rule = set(vals[np.argsort(-counts)][:topk].tolist())
        resv = vals[item_cluster[vals] >= n_content]
        rcounts = counts[item_cluster[vals] >= n_content]
        rule_r = set(resv[np.argsort(-rcounts)][:topk].tolist())
        for t in tgt:
            n_eval += 1
            hits["aware"] += int(aware is not None and int(t) in aware)
            hits["blind"] += int(blind is not None and int(t) in blind)
            hits["rule"] += int(int(t) in rule)
            hits["rule_reserved"] += int(int(t) in rule_r)
    out = {f"{k}_hit@10": v / max(n_eval, 1) for k, v in hits.items()}
    out["n_eval"] = n_eval
    return out


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
    ap.add_argument("--v3", action="store_true",
                    help="action-conditional (v3) corpus + aware/blind oracles")
    ap.add_argument("--target_rule_p", type=float, default=0.9)
    ap.add_argument("--n_target_clusters", type=int, default=24)
    ap.add_argument("--target_cluster_size", type=int, default=10)
    ap.add_argument("--session_topic_q", type=float, default=0.9)
    ap.add_argument("--click_topic_q", type=float, default=0.0)
    ap.add_argument("--cart_freq", type=float, default=0.3)
    a = ap.parse_args()
    if a.v3:
        spec = SyntheticSpec(
            n_users=a.users, n_items=a.items, n_clusters=a.clusters,
            min_len=a.min_len, max_len=a.max_len, num_levels=4,
            level_sizes=(64, 64, 64, 64), behaviors=("click", "cart", "buy"),
            behavior_freq=(1.0 - a.cart_freq - 0.15, a.cart_freq, 0.15),
            session_len=6, min_sessions=4,
            emb_dim=128, seed=a.seed, item_pop_alpha=a.pop_alpha,
            target_rule_p=a.target_rule_p,
            n_target_clusters=a.n_target_clusters,
            target_cluster_size=a.target_cluster_size,
            session_topic_q=a.session_topic_q, click_topic_q=a.click_topic_q)
        r = headroom_v3(spec)
        print({"geometry": f"{a.users}u/{a.items}i/{a.clusters}c", **r,
               "aware_vs_blind": r["aware_hit@10"] / max(r["blind_hit@10"], 1e-9),
               "aware_vs_rule": r["aware_hit@10"]
               / max(max(r["rule_hit@10"], r["rule_reserved_hit@10"]), 1e-9)})
        return
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
