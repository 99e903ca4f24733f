"""Token-prefix KV cache store (the MCTS throughput lever).

MCTS expansion prompts are prefix-heavy: every child's chat prompt starts
with the bytes of its parent's prompt (SURVEY.md §7.3 — prefix caching is
the main lever for the tokens/sec target). This store keeps compact
per-sequence KV slices keyed by their token ids, serves
longest-prefix lookups, and evicts LRU under a byte budget.

Lookups scan stored token arrays with one vectorized compare per entry —
entries are bounded (tens) and prompts ≤ max_model_len, so host cost is
negligible next to a device prefill.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import numpy as np


class PrefixCacheStore:
    def __init__(self, max_bytes: int = 1_500_000_000, min_reuse: int = 64):
        self.max_bytes = int(max_bytes)
        self.min_reuse = int(min_reuse)
        self._entries: OrderedDict[tuple, dict] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.tokens_reused = 0

    def __len__(self):
        return len(self._entries)

    @property
    def nbytes(self):
        return self._bytes

    def put(self, tokens: list[int], kv: tuple[Any, Any]) -> None:
        """kv: (k, v) arrays of shape (layers, len, n_kv, head_dim)."""
        key = tuple(int(t) for t in tokens)
        if not key:
            return
        size = int(kv[0].size * kv[0].dtype.itemsize * 2)
        if size > self.max_bytes:
            return
        if key in self._entries:
            old = self._entries.pop(key)
            self._bytes -= old["bytes"]
        self._entries[key] = {
            "tokens": np.asarray(key, np.int64),
            "kv": kv,
            "bytes": size,
        }
        self._bytes += size
        while self._bytes > self.max_bytes and self._entries:
            _, old = self._entries.popitem(last=False)
            self._bytes -= old["bytes"]

    def longest_prefix(self, tokens: list[int], max_use: int | None = None):
        """Longest stored entry that is a prefix of ``tokens``.

        Returns (kv_k_slice, kv_v_slice, plen) or None. ``max_use`` caps the
        reused length (callers keep >=1 suffix token for last-logits).
        """
        q = np.asarray(tokens, np.int64)
        cap = len(q) if max_use is None else min(len(q), max_use)
        best_key, best_len = None, 0
        for key, ent in self._entries.items():
            t = ent["tokens"]
            n = min(len(t), cap)
            if n <= best_len or n < self.min_reuse:
                continue
            if np.array_equal(t[:n], q[:n]):
                best_key, best_len = key, n
        if best_key is None:
            self.misses += 1
            return None
        ent = self._entries.pop(best_key)  # LRU bump
        self._entries[best_key] = ent
        self.hits += 1
        self.tokens_reused += best_len
        k, v = ent["kv"]
        return k[:, :best_len], v[:, :best_len], best_len

    def clear(self):
        self._entries.clear()
        self._bytes = 0

    def stats(self) -> dict:
        return {"entries": len(self._entries), "bytes": self._bytes,
                "hits": self.hits, "misses": self.misses,
                "tokens_reused": self.tokens_reused}
