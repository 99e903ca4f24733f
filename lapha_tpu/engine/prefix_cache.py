"""Token-prefix KV cache store (the MCTS throughput lever).

MCTS expansion prompts are prefix-heavy: every child's chat prompt starts
with the bytes of its parent's prompt (SURVEY.md §7.3 — prefix caching is
the main lever for the tokens/sec target). This store keeps compact
per-sequence KV slices keyed by their token ids, serves longest-prefix
lookups, and evicts LRU under a byte budget.

Lookups go through a token radix trie — the C++ `lapha_native.PrefixTree`
when compiled (O(prompt_len) regardless of entry count; see
native/lapha_native.cpp), else the pure-Python trie with the same API.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

from ..native import make_prefix_tree


class PrefixCacheStore:
    def __init__(self, max_bytes: int = 1_500_000_000, min_reuse: int = 64,
                 pad_to: int = 128):
        self.max_bytes = int(max_bytes)
        self.min_reuse = int(min_reuse)
        # KV slices are stored padded to a multiple of pad_to along the
        # length axis: lookups then return ONE of few bucketed shapes, so
        # the engine's batched suffix-prefill writes compile once per
        # bucket instead of once per exact prefix length (remote-TPU
        # compiles are expensive). The true length travels alongside.
        self.pad_to = max(1, int(pad_to))
        self._entries: OrderedDict[int, dict] = OrderedDict()  # handle -> entry
        self._key_to_handle: dict[tuple, int] = {}
        self._trie = make_prefix_tree()
        self._next_handle = 0
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.tokens_reused = 0

    def __len__(self):
        return len(self._entries)

    @property
    def nbytes(self):
        return self._bytes

    def _evict(self, handle: int) -> None:
        ent = self._entries.pop(handle, None)
        if ent is None:
            return
        self._bytes -= ent["bytes"]
        self._key_to_handle.pop(ent["key"], None)
        self._trie.remove(handle)

    def put(self, tokens: list[int], kv: tuple[Any, Any], h_sum=None) -> None:
        """kv: (k, v) arrays of shape (layers, len, n_kv, head_dim), padded
        to ``pad_to`` along the length axis (true length = len(tokens));
        h_sum: optional (H,) final-hidden sum over these tokens (collect_h0
        engines reuse it so fused value pooling also skips the prefix)."""
        key = tuple(int(t) for t in tokens)
        if not key:
            return
        k, v = kv
        n = len(key)
        pad_len = -(-n // self.pad_to) * self.pad_to
        if k.shape[1] < pad_len:
            import jax.numpy as jnp

            width = [(0, 0)] * k.ndim
            width[1] = (0, pad_len - k.shape[1])
            k = jnp.pad(k, width)
            v = jnp.pad(v, width)
        kv = (k, v)
        size = int(kv[0].size * kv[0].dtype.itemsize * 2)
        if size > self.max_bytes:
            return
        old = self._key_to_handle.get(key)
        if old is not None:
            self._evict(old)
        handle = self._next_handle
        self._next_handle += 1
        self._entries[handle] = {"key": key, "kv": kv, "bytes": size,
                                 "h_sum": h_sum}
        self._key_to_handle[key] = handle
        self._trie.insert(list(key), handle)
        self._bytes += size
        while self._bytes > self.max_bytes and self._entries:
            oldest = next(iter(self._entries))
            self._evict(oldest)

    def longest_prefix(self, tokens: list[int], max_use: int | None = None,
                       allow_partial: bool = True):
        """Longest stored entry that is a prefix of ``tokens``.

        Returns (kv_k, kv_v, plen, h_sum) or None, where kv_k/kv_v are the
        FULL padded stored arrays and ``plen`` is how many leading slots are
        valid for this lookup — callers must mask/overwrite past plen (no
        device slicing here: returning the bucket-padded array keeps the
        consumer's compiled shapes to a handful of buckets). ``max_use``
        caps the reused length (callers keep >=1 suffix token for
        last-logits). ``allow_partial=False`` disables the capped
        exact-match path, where only part of an entry is reused — collect_h0
        engines need the stored h_sum to cover exactly the reused tokens."""
        toks = [int(t) for t in tokens]
        cap = len(toks) if max_use is None else min(len(toks), max_use)
        # exact-match entries sit past the cap in the trie (terminal at full
        # length); reuse their first `cap` tokens directly
        exact = self._key_to_handle.get(tuple(toks)) if allow_partial else None
        if exact is not None and cap >= self.min_reuse:
            hit = (exact, cap)
            partial = True
        else:
            hit = self._trie.longest_prefix(toks, cap)
            partial = False
        if hit is None or hit[1] < self.min_reuse:
            self.misses += 1
            return None
        handle, plen = hit
        ent = self._entries.pop(handle)  # LRU bump
        self._entries[handle] = ent
        self.hits += 1
        self.tokens_reused += plen
        k, v = ent["kv"]
        h_sum = None if partial else ent.get("h_sum")
        return k, v, plen, h_sum

    def clear(self):
        for handle in list(self._entries):
            self._evict(handle)

    def stats(self) -> dict:
        return {"entries": len(self._entries), "bytes": self._bytes,
                "hits": self.hits, "misses": self.misses,
                "tokens_reused": self.tokens_reused}
