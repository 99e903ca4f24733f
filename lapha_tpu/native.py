"""Loader for the C++ runtime primitives (with pure-Python fallback).

Tries, in order: an already-importable ``lapha_native``, a cached build
under native/, an on-demand compile (g++ via setuptools). The Python
fallbacks implement identical semantics so everything works uncompiled —
the native module is the production path for high request rates.
"""

from __future__ import annotations

import os
import subprocess
import sys

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")

_native = None
_tried = False


def _try_import():
    global _native
    try:
        import lapha_native  # noqa: F401

        _native = lapha_native
        return True
    except ImportError:
        return False


def load_native(build: bool = True):
    """Returns the lapha_native module or None."""
    global _native, _tried
    if _native is not None:
        return _native
    if _tried:
        return _native
    _tried = True

    if _try_import():
        return _native
    if _NATIVE_DIR not in sys.path and os.path.isdir(_NATIVE_DIR):
        sys.path.append(_NATIVE_DIR)
        if _try_import():
            return _native
    if build and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                [sys.executable, "setup.py", "build_ext", "--inplace"],
                cwd=_NATIVE_DIR, capture_output=True, timeout=180, check=True,
            )
            _try_import()
        except Exception:
            pass
    return _native


# ------------------------------------------------------------ python fallbacks

class PyPrefixTree:
    """Token radix trie; same API as lapha_native.PrefixTree."""

    def __init__(self):
        self._root: dict = {}
        self._handles: dict[int, tuple] = {}

    def insert(self, tokens, handle: int) -> None:
        node = self._root
        for t in tokens:
            node = node.setdefault(int(t), {})
        old = node.get("__handle__")
        if old is not None:
            self._handles.pop(old, None)
        node["__handle__"] = handle
        self._handles[handle] = (tuple(int(t) for t in tokens), node)

    def longest_prefix(self, tokens, max_len: int = -1):
        cap = len(tokens) if max_len < 0 else min(len(tokens), max_len)
        node = self._root
        best = None
        for i in range(cap):
            node = node.get(int(tokens[i]))
            if node is None:
                break
            h = node.get("__handle__")
            if h is not None:
                best = (h, i + 1)
        return best

    def remove(self, handle: int) -> bool:
        ent = self._handles.pop(handle, None)
        if ent is None:
            return False
        ent[1].pop("__handle__", None)
        return True

    def __len__(self):
        return len(self._handles)


class PySlotAllocator:
    def __init__(self, capacity: int):
        self.capacity = int(capacity)
        self._free = list(range(self.capacity - 1, -1, -1))

    def acquire(self, n: int = 1):
        if len(self._free) < n:
            return None
        return [self._free.pop() for _ in range(n)]

    def release(self, slots):
        for s in slots:
            s = int(s)
            if not 0 <= s < self.capacity:
                raise ValueError("slot out of range")
            self._free.append(s)

    def available(self) -> int:
        return len(self._free)


def make_prefix_tree():
    mod = load_native()
    return mod.PrefixTree() if mod is not None else PyPrefixTree()


def make_slot_allocator(capacity: int):
    mod = load_native()
    return mod.SlotAllocator(capacity) if mod is not None else PySlotAllocator(capacity)
