"""Fixed-length semantic-ID trie compiled to dense level tables.

The reference constrains HF beam search with a Python dict trie called per
token per beam from the host (ref: SeqRec/generation/trie.py:5-104,
test_SMB_decoder.py:477-502) — a host<->device sync every decode step. Because
all semantic IDs share a fixed length L with level-disjoint token ranges
(gamer_tpu/data/vocab.py), the trie is a leveled DAG and compiles once into
dense arrays that live on device:

  allowed[k]  [n_nodes_k, size_k]  bool — codes allowed at level k from node
  child[k]    [n_nodes_k, size_k]  int32 — node id at level k+1 (-1 invalid)
  item_at_leaf [n_nodes_L]         int32 — candidate row index at each leaf

Decoding then indexes these tables inside jit: zero host round-trips.
`prefix_allowed_tokens_fn_by_last_token` semantics (restart at item boundaries,
ref trie.py:92-104) are inherent here because the decode loop decodes exactly
one item of L levels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class LeveledTrie:
    """Dense leveled trie over candidate code rows.

    Built from `codes` [N, L] (token ids or per-level codes — pass the
    corresponding `level_offsets` so values are normalized to 0-based codes).
    """

    allowed: list[np.ndarray]
    child: list[np.ndarray]
    leaf_candidate: np.ndarray  # [n_leaf_nodes] row index into the candidate set
    level_sizes: tuple[int, ...]
    level_token_base: tuple[int, ...]  # vocab token id of code 0 per level

    @classmethod
    def build(
        cls,
        codes: np.ndarray,  # [N, L] 0-based per-level codes
        level_sizes: list[int] | tuple[int, ...],
        level_token_base: list[int] | tuple[int, ...],
    ) -> "LeveledTrie":
        codes = np.asarray(codes, dtype=np.int64)
        N, L = codes.shape
        assert len(level_sizes) == L
        # assign node ids level by level via lexicographic grouping
        order = np.lexsort(codes.T[::-1])  # rows sorted by code tuple
        sorted_codes = codes[order]
        allowed: list[np.ndarray] = []
        child: list[np.ndarray] = []
        # node id of each (sorted) row at current level; level 0: all at root 0
        node_of_row = np.zeros(N, dtype=np.int64)
        n_nodes = 1
        for k in range(L):
            size = int(level_sizes[k])
            a = np.zeros((n_nodes, size), dtype=bool)
            c = np.full((n_nodes, size), -1, dtype=np.int32)
            col = sorted_codes[:, k]
            a[node_of_row, col] = True
            # children: unique (node, code) pairs in row order get consecutive ids
            pair = node_of_row * size + col
            uniq, inverse = np.unique(pair, return_inverse=True)
            c[uniq // size, uniq % size] = np.arange(len(uniq), dtype=np.int32)
            allowed.append(a)
            child.append(c)
            node_of_row = inverse
            n_nodes = len(uniq)
        # leaf -> candidate row (first row claiming the leaf wins; duplicates
        # collapse exactly like the reference's set() of item strings)
        leaf_candidate = np.full(n_nodes, -1, dtype=np.int32)
        for r in range(N - 1, -1, -1):
            leaf_candidate[node_of_row[r]] = order[r]
        return cls(allowed, child, leaf_candidate, tuple(int(s) for s in level_sizes),
                   tuple(int(b) for b in level_token_base))

    @classmethod
    def from_token_rows(cls, token_rows: np.ndarray, vocab) -> "LeveledTrie":
        """token_rows: [N, L] vocab token ids of the candidate items."""
        L = token_rows.shape[1]
        bases = [vocab.code_token(l, 0) for l in range(L)]
        codes = token_rows - np.asarray(bases)[None, :]
        return cls.build(codes, list(vocab.level_sizes[:L]), bases)

    @property
    def num_levels(self) -> int:
        return len(self.allowed)

    def lookup_prefix(self, prefix_codes: list[int]) -> np.ndarray:
        """Host-side check (tests): allowed 0-based codes after a prefix."""
        node = 0
        for k, c in enumerate(prefix_codes):
            node = int(self.child[k][node, c])
            if node < 0:
                return np.zeros(self.level_sizes[len(prefix_codes)], dtype=bool)
        return self.allowed[len(prefix_codes)][node]
