"""C++ extension vs Python fallback: identical semantics."""

import random

import pytest

from lapha_tpu.native import PyPrefixTree, PySlotAllocator, load_native


def impls():
    out = [("python", PyPrefixTree, PySlotAllocator)]
    native = load_native()
    if native is not None:
        out.append(("native", native.PrefixTree, native.SlotAllocator))
    return out


@pytest.mark.parametrize("name,Tree,Alloc", impls(), ids=[i[0] for i in impls()])
class TestPrimitives:
    def test_trie_basic(self, name, Tree, Alloc):
        t = Tree()
        t.insert([1, 2, 3, 4], 100)
        t.insert([1, 2], 200)
        assert t.longest_prefix([1, 2, 3, 4, 5]) == (100, 4)
        assert t.longest_prefix([1, 2, 3]) == (200, 2)
        assert t.longest_prefix([1, 2, 3, 4, 5], 3) == (200, 2)  # capped
        assert t.longest_prefix([9, 9]) is None
        assert len(t) == 2

    def test_trie_remove_and_replace(self, name, Tree, Alloc):
        t = Tree()
        t.insert([5, 6, 7], 1)
        assert t.remove(1) is True
        assert t.remove(1) is False
        assert t.longest_prefix([5, 6, 7]) is None
        t.insert([5, 6], 2)
        t.insert([5, 6], 3)  # replace handle at same key
        assert t.longest_prefix([5, 6, 9]) == (3, 2)
        assert len(t) == 1

    def test_trie_fuzz_vs_linear(self, name, Tree, Alloc):
        rng = random.Random(0)
        t = Tree()
        entries = {}
        for h in range(60):
            key = tuple(rng.randrange(5) for _ in range(rng.randrange(1, 10)))
            t.insert(list(key), h)
            entries = {k: v for k, v in entries.items() if k != key}
            entries[key] = h
        for _ in range(200):
            q = [rng.randrange(5) for _ in range(rng.randrange(0, 14))]
            best = None
            for key, h in entries.items():
                n = len(key)
                if n <= len(q) and tuple(q[:n]) == key:
                    if best is None or n > best[1]:
                        best = (h, n)
            assert t.longest_prefix(q) == best

    def test_slot_allocator(self, name, Tree, Alloc):
        a = Alloc(8)
        s1 = a.acquire(3)
        assert len(s1) == 3 and a.available() == 5
        s2 = a.acquire(5)
        assert len(s2) == 5 and a.available() == 0
        assert a.acquire(1) is None
        a.release(s1)
        assert a.available() == 3
        assert sorted(set(s1) | set(s2)) == list(range(8))
        with pytest.raises(ValueError):
            a.release([99])


def test_native_module_compiled():
    """The C++ extension must actually build in this image (g++ present)."""
    assert load_native() is not None, "lapha_native failed to compile/load"


def test_prefix_store_uses_trie():
    import numpy as np

    from lapha_tpu.engine.prefix_cache import PrefixCacheStore

    s = PrefixCacheStore(max_bytes=10**9, min_reuse=2)
    k = np.zeros((2, 6, 2, 4), np.float32)
    s.put([1, 2, 3, 4, 5, 6], (k, k))
    hit = s.longest_prefix([1, 2, 3, 4, 5, 6, 7, 8])
    assert hit is not None and hit[2] == 6
    # exact-match capped reuse
    hit2 = s.longest_prefix([1, 2, 3, 4, 5, 6], max_use=5)
    assert hit2 is not None and hit2[2] == 5
