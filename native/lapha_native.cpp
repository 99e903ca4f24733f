// lapha_native: C++ runtime primitives for the generation engine.
//
// The reference delegates its serving runtime to vLLM's C++/CUDA core
// (SURVEY.md §2.4); this module provides the TPU-native equivalents of the
// host-side data structures that must be fast at production request rates:
//
//   PrefixTree    — token-level radix trie with longest-prefix lookup and
//                   O(len) insert/remove; backs the KV prefix cache so
//                   lookups stay O(prompt_len) regardless of entry count
//                   (the Python fallback scans all entries).
//   SlotAllocator — free-list slot allocator for continuous batching
//                   (decode-slot assignment/recycling without Python-object
//                   churn on the scheduler hot path).
//
// Built with the CPython C API (no pybind11 in this image); see
// native/setup.py. lapha_tpu/native.py loads it with a pure-Python
// fallback so the package works before compilation.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- PrefixTree

struct TrieNode {
  std::unordered_map<int64_t, std::unique_ptr<TrieNode>> children;
  // handle of an entry terminating exactly here, or -1
  int64_t handle = -1;
  // depth == number of tokens from the root
  int32_t depth = 0;
};

struct PrefixTreeObject {
  PyObject_HEAD
  TrieNode* root;
  // handle -> terminal node (for removal)
  std::unordered_map<int64_t, TrieNode*>* terminals;
  int64_t size;
};

static int tokens_from_obj(PyObject* seq, std::vector<int64_t>& out) {
  PyObject* fast = PySequence_Fast(seq, "tokens must be a sequence of ints");
  if (!fast) return -1;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out.reserve((size_t)n);
  for (Py_ssize_t i = 0; i < n; i++) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    int64_t v = PyLong_AsLongLong(item);
    if (v == -1 && PyErr_Occurred()) {
      Py_DECREF(fast);
      return -1;
    }
    out.push_back(v);
  }
  Py_DECREF(fast);
  return 0;
}

static PyObject* PrefixTree_new(PyTypeObject* type, PyObject*, PyObject*) {
  PrefixTreeObject* self = (PrefixTreeObject*)type->tp_alloc(type, 0);
  if (!self) return nullptr;
  self->root = new TrieNode();
  self->terminals = new std::unordered_map<int64_t, TrieNode*>();
  self->size = 0;
  return (PyObject*)self;
}

static void PrefixTree_dealloc(PrefixTreeObject* self) {
  delete self->root;
  delete self->terminals;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

// insert(tokens, handle) -> None; replaces any entry at the same tokens
static PyObject* PrefixTree_insert(PrefixTreeObject* self, PyObject* args) {
  PyObject* seq;
  long long handle;
  if (!PyArg_ParseTuple(args, "OL", &seq, &handle)) return nullptr;
  std::vector<int64_t> toks;
  if (tokens_from_obj(seq, toks) < 0) return nullptr;

  TrieNode* node = self->root;
  for (int64_t t : toks) {
    auto it = node->children.find(t);
    if (it == node->children.end()) {
      auto child = std::make_unique<TrieNode>();
      child->depth = node->depth + 1;
      it = node->children.emplace(t, std::move(child)).first;
    }
    node = it->second.get();
  }
  if (node->handle >= 0) self->terminals->erase(node->handle);
  else self->size++;
  node->handle = handle;
  (*self->terminals)[handle] = node;
  Py_RETURN_NONE;
}

// longest_prefix(tokens, max_len=-1) -> (handle, length) | None
static PyObject* PrefixTree_longest_prefix(PrefixTreeObject* self, PyObject* args) {
  PyObject* seq;
  long long max_len = -1;
  if (!PyArg_ParseTuple(args, "O|L", &seq, &max_len)) return nullptr;
  std::vector<int64_t> toks;
  if (tokens_from_obj(seq, toks) < 0) return nullptr;

  size_t cap = toks.size();
  if (max_len >= 0 && (size_t)max_len < cap) cap = (size_t)max_len;

  TrieNode* node = self->root;
  int64_t best_handle = -1;
  int32_t best_len = 0;
  for (size_t i = 0; i < cap; i++) {
    auto it = node->children.find(toks[i]);
    if (it == node->children.end()) break;
    node = it->second.get();
    if (node->handle >= 0) {
      best_handle = node->handle;
      best_len = node->depth;
    }
  }
  if (best_handle < 0) Py_RETURN_NONE;
  return Py_BuildValue("(Li)", (long long)best_handle, (int)best_len);
}

// remove(handle) -> bool (prunes childless ancestors)
static PyObject* PrefixTree_remove(PrefixTreeObject* self, PyObject* args) {
  long long handle;
  if (!PyArg_ParseTuple(args, "L", &handle)) return nullptr;
  auto it = self->terminals->find(handle);
  if (it == self->terminals->end()) Py_RETURN_FALSE;
  it->second->handle = -1;
  self->terminals->erase(it);
  self->size--;
  // note: nodes are left in place (cheap; full prune would need parent
  // links). Entry count is what callers budget on.
  Py_RETURN_TRUE;
}

static PyObject* PrefixTree_len(PrefixTreeObject* self, PyObject*) {
  return PyLong_FromLongLong(self->size);
}

static PyMethodDef PrefixTree_methods[] = {
    {"insert", (PyCFunction)PrefixTree_insert, METH_VARARGS,
     "insert(tokens, handle)"},
    {"longest_prefix", (PyCFunction)PrefixTree_longest_prefix, METH_VARARGS,
     "longest_prefix(tokens, max_len=-1) -> (handle, length) | None"},
    {"remove", (PyCFunction)PrefixTree_remove, METH_VARARGS,
     "remove(handle) -> bool"},
    {"__len__", (PyCFunction)PrefixTree_len, METH_NOARGS, "entry count"},
    {nullptr, nullptr, 0, nullptr},
};

static Py_ssize_t PrefixTree_length(PyObject* self) {
  return (Py_ssize_t)((PrefixTreeObject*)self)->size;
}

static PySequenceMethods PrefixTree_as_sequence = {
    PrefixTree_length, /* sq_length */
};

static PyTypeObject PrefixTreeType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// -------------------------------------------------------------- SlotAllocator

struct SlotAllocatorObject {
  PyObject_HEAD
  std::vector<int32_t>* free_slots;  // LIFO free list
  int32_t capacity;
};

static PyObject* SlotAllocator_new(PyTypeObject* type, PyObject* args, PyObject*) {
  int capacity = 0;
  if (!PyArg_ParseTuple(args, "i", &capacity)) return nullptr;
  SlotAllocatorObject* self = (SlotAllocatorObject*)type->tp_alloc(type, 0);
  if (!self) return nullptr;
  self->capacity = capacity;
  self->free_slots = new std::vector<int32_t>();
  self->free_slots->reserve((size_t)capacity);
  for (int32_t i = capacity - 1; i >= 0; i--) self->free_slots->push_back(i);
  return (PyObject*)self;
}

static void SlotAllocator_dealloc(SlotAllocatorObject* self) {
  delete self->free_slots;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* SlotAllocator_acquire(SlotAllocatorObject* self, PyObject* args) {
  int n = 1;
  if (!PyArg_ParseTuple(args, "|i", &n)) return nullptr;
  if ((int)self->free_slots->size() < n) Py_RETURN_NONE;
  PyObject* out = PyList_New(n);
  if (!out) return nullptr;
  for (int i = 0; i < n; i++) {
    int32_t slot = self->free_slots->back();
    self->free_slots->pop_back();
    PyList_SET_ITEM(out, i, PyLong_FromLong(slot));
  }
  return out;
}

static PyObject* SlotAllocator_release(SlotAllocatorObject* self, PyObject* args) {
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "O", &seq)) return nullptr;
  std::vector<int64_t> slots;
  if (tokens_from_obj(seq, slots) < 0) return nullptr;
  for (int64_t s : slots) {
    if (s < 0 || s >= self->capacity) {
      PyErr_SetString(PyExc_ValueError, "slot out of range");
      return nullptr;
    }
    self->free_slots->push_back((int32_t)s);
  }
  Py_RETURN_NONE;
}

static PyObject* SlotAllocator_available(SlotAllocatorObject* self, PyObject*) {
  return PyLong_FromSize_t(self->free_slots->size());
}

static PyMethodDef SlotAllocator_methods[] = {
    {"acquire", (PyCFunction)SlotAllocator_acquire, METH_VARARGS,
     "acquire(n=1) -> [slots] | None if not enough free"},
    {"release", (PyCFunction)SlotAllocator_release, METH_VARARGS,
     "release(slots)"},
    {"available", (PyCFunction)SlotAllocator_available, METH_NOARGS,
     "free slot count"},
    {nullptr, nullptr, 0, nullptr},
};

static PyTypeObject SlotAllocatorType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

// ------------------------------------------------------------------- module

static PyModuleDef lapha_native_module = {
    PyModuleDef_HEAD_INIT, "lapha_native",
    "C++ runtime primitives: PrefixTree, SlotAllocator", -1,
    nullptr, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_lapha_native(void) {
  PrefixTreeType.tp_name = "lapha_native.PrefixTree";
  PrefixTreeType.tp_basicsize = sizeof(PrefixTreeObject);
  PrefixTreeType.tp_flags = Py_TPFLAGS_DEFAULT;
  PrefixTreeType.tp_new = PrefixTree_new;
  PrefixTreeType.tp_dealloc = (destructor)PrefixTree_dealloc;
  PrefixTreeType.tp_methods = PrefixTree_methods;
  PrefixTreeType.tp_as_sequence = &PrefixTree_as_sequence;
  if (PyType_Ready(&PrefixTreeType) < 0) return nullptr;

  SlotAllocatorType.tp_name = "lapha_native.SlotAllocator";
  SlotAllocatorType.tp_basicsize = sizeof(SlotAllocatorObject);
  SlotAllocatorType.tp_flags = Py_TPFLAGS_DEFAULT;
  SlotAllocatorType.tp_new = SlotAllocator_new;
  SlotAllocatorType.tp_dealloc = (destructor)SlotAllocator_dealloc;
  SlotAllocatorType.tp_methods = SlotAllocator_methods;
  if (PyType_Ready(&SlotAllocatorType) < 0) return nullptr;

  PyObject* m = PyModule_Create(&lapha_native_module);
  if (!m) return nullptr;
  Py_INCREF(&PrefixTreeType);
  PyModule_AddObject(m, "PrefixTree", (PyObject*)&PrefixTreeType);
  Py_INCREF(&SlotAllocatorType);
  PyModule_AddObject(m, "SlotAllocator", (PyObject*)&SlotAllocatorType);
  return m;
}
