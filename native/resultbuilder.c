/* CPython extension: batch SearchResult construction for query_batch.
 *
 * The reference returns List<SearchResult> per query
 * (api/VectorIndex.java:114-130, api/SearchResult.java:5-18); building
 * nq*k namedtuples in Python bytecode costs ~8 ms per 512x10 batch under
 * the GIL — the serving-throughput ceiling for the object API. This builder
 * walks the merged result planes in C and creates the SearchResult
 * instances via tuple.__new__(cls, items), skipping the namedtuple's
 * Python-level __new__.
 *
 * build_results(cls, gid i64[nq,k], score f32[nq,k], dist f32[nq,k],
 *               slot i32[nq,k], vid i32[nq,k], valid u8/bool[nq,k],
 *               payload_lists: list[list | (off, len, blob)])
 *     -> list[list[cls]]
 *
 * payload_lists[slot] is either a Python list (payload_lists[slot][vid] is
 * the payload object, borrowed and INCREFed into the result) or a payload-
 * ARENA descriptor 3-tuple (off i64[cap], len i64[cap], blob u8[*]) — the
 * fast path for VectorIndexConfig.payload_storage="arena"
 * (core/payloads.py::PayloadArena.c_planes), where the payload bytes are
 * created directly from the blob at C speed (off[vid] < 0 -> None). The
 * arena's copy-on-grow blob guarantees the exported buffer is never resized
 * under us. Entries with valid==0 are skipped; a valid entry whose slot/vid
 * falls outside the payload planes raises IndexError (merge-plane bug —
 * matches the Python fallback). All arrays must be C-contiguous with
 * exactly the dtypes above; the caller wraps this in try/except and falls
 * back to the pure-Python loop on any error.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>

typedef struct {
  Py_buffer buf;
  int held;
} held_buf;

/* per-slot payload source: a Python list, or arena planes */
typedef struct {
  PyObject *list;      /* non-NULL => list mode */
  const int64_t *off;  /* arena mode */
  const int64_t *len;
  const char *blob;
  Py_ssize_t n_rows;   /* arena: plane length */
  Py_ssize_t blob_len;
  held_buf bufs[3];
} slot_src;

static int init_slot_src(PyObject *entry, slot_src *s) {
  memset(s, 0, sizeof(*s));
  if (PyList_Check(entry)) {
    s->list = entry;
    return 0;
  }
  if (!PyTuple_Check(entry) || PyTuple_GET_SIZE(entry) != 3) {
    PyErr_SetString(PyExc_TypeError,
                    "payload entry must be a list or (off, len, blob)");
    return -1;
  }
  for (int i = 0; i < 3; i++) {
    if (PyObject_GetBuffer(PyTuple_GET_ITEM(entry, i), &s->bufs[i].buf,
                           PyBUF_C_CONTIGUOUS) != 0)
      return -1;
    s->bufs[i].held = 1;
  }
  if (s->bufs[0].buf.len != s->bufs[1].buf.len ||
      s->bufs[0].buf.len % 8 != 0) {
    PyErr_SetString(PyExc_ValueError, "arena off/len plane size mismatch");
    return -1;
  }
  s->off = (const int64_t *)s->bufs[0].buf.buf;
  s->len = (const int64_t *)s->bufs[1].buf.buf;
  s->blob = (const char *)s->bufs[2].buf.buf;
  s->n_rows = s->bufs[0].buf.len / 8;
  s->blob_len = s->bufs[2].buf.len;
  return 0;
}

static void release_slot_src(slot_src *s) {
  for (int i = 0; i < 3; i++)
    if (s->bufs[i].held) PyBuffer_Release(&s->bufs[i].buf);
}

static int get_buf(PyObject *o, held_buf *h, Py_ssize_t itemsize,
                   Py_ssize_t nq, Py_ssize_t k, const char *name) {
  if (PyObject_GetBuffer(o, &h->buf, PyBUF_C_CONTIGUOUS) != 0) return -1;
  h->held = 1;
  if (h->buf.len != itemsize * nq * k) {
    PyErr_Format(PyExc_ValueError, "%s: unexpected buffer size", name);
    return -1;
  }
  return 0;
}

static PyObject *build_results(PyObject *self, PyObject *args) {
  PyObject *cls, *gid_o, *score_o, *dist_o, *slot_o, *vid_o, *valid_o,
      *payloads;
  Py_ssize_t nq, k;
  if (!PyArg_ParseTuple(args, "OOOOOOOOnn", &cls, &gid_o, &score_o, &dist_o,
                        &slot_o, &vid_o, &valid_o, &payloads, &nq, &k))
    return NULL;
  if (!PyType_Check(cls) ||
      !PyType_IsSubtype((PyTypeObject *)cls, &PyTuple_Type)) {
    PyErr_SetString(PyExc_TypeError, "cls must be a tuple subclass");
    return NULL;
  }
  if (!PyList_Check(payloads)) {
    PyErr_SetString(PyExc_TypeError, "payload_lists must be a list");
    return NULL;
  }
  held_buf hb[6] = {{{0}, 0}, {{0}, 0}, {{0}, 0}, {{0}, 0}, {{0}, 0}, {{0}, 0}};
  slot_src *srcs = NULL;
  Py_ssize_t n_srcs = 0;
  PyObject *out = NULL;
  if (get_buf(gid_o, &hb[0], 8, nq, k, "gid") ||
      get_buf(score_o, &hb[1], 4, nq, k, "score") ||
      get_buf(dist_o, &hb[2], 4, nq, k, "dist") ||
      get_buf(slot_o, &hb[3], 4, nq, k, "slot") ||
      get_buf(vid_o, &hb[4], 4, nq, k, "vid") ||
      get_buf(valid_o, &hb[5], 1, nq, k, "valid"))
    goto done;
  n_srcs = PyList_GET_SIZE(payloads);
  if (n_srcs > 0) {
    srcs = (slot_src *)PyMem_Malloc((size_t)n_srcs * sizeof(slot_src));
    if (!srcs) { PyErr_NoMemory(); goto done; }
    for (Py_ssize_t i = 0; i < n_srcs; i++) {
      if (init_slot_src(PyList_GET_ITEM(payloads, i), &srcs[i])) {
        for (Py_ssize_t j = 0; j <= i; j++) release_slot_src(&srcs[j]);
        PyMem_Free(srcs);
        srcs = NULL;
        goto done;
      }
    }
  }
  {
    const int64_t *gid = (const int64_t *)hb[0].buf.buf;
    const float *score = (const float *)hb[1].buf.buf;
    const float *dist = (const float *)hb[2].buf.buf;
    const int32_t *slot = (const int32_t *)hb[3].buf.buf;
    const int32_t *vid = (const int32_t *)hb[4].buf.buf;
    const uint8_t *valid = (const uint8_t *)hb[5].buf.buf;
    Py_ssize_t n_slots = n_srcs;

    out = PyList_New(nq);
    if (!out) goto done;
    for (Py_ssize_t qi = 0; qi < nq; qi++) {
      PyObject *row = PyList_New(0);
      if (!row) goto fail;
      PyList_SET_ITEM(out, qi, row); /* steals */
      for (Py_ssize_t j = 0; j < k; j++) {
        Py_ssize_t at = qi * k + j;
        if (!valid[at]) continue;
        int32_t sl = slot[at], vv = vid[at];
        PyObject *payload; /* always a NEW reference below */
        if (sl < 0 || sl >= n_slots || vv < 0) {
          PyErr_Format(PyExc_IndexError,
                       "valid result with out-of-range slot/vid "
                       "(slot=%d, vid=%d, n_slots=%zd)", (int)sl, (int)vv,
                       n_slots);
          goto fail;
        }
        slot_src *src = &srcs[sl];
        if (src->list) {
          if (vv >= PyList_GET_SIZE(src->list)) {
            /* valid==1 but the location falls outside the payload planes:
             * a merge-plane bug — surface it like the Python fallback's
             * IndexError would, instead of masking it as payload=None */
            PyErr_Format(PyExc_IndexError,
                         "valid result points outside payload planes "
                         "(slot=%d, vid=%d)", (int)sl, (int)vv);
            goto fail;
          }
          /* INCREF the borrowed payload BEFORE any allocation below: object
           * construction can trigger cyclic GC running arbitrary __del__
           * code that could mutate the list and drop its last reference */
          payload = PyList_GET_ITEM(src->list, vv);
          Py_INCREF(payload);
        } else { /* arena planes */
          if (vv >= src->n_rows) {
            PyErr_Format(PyExc_IndexError,
                         "valid result points outside arena planes "
                         "(slot=%d, vid=%d)", (int)sl, (int)vv);
            goto fail;
          }
          int64_t o = src->off[vv], ln = src->len[vv];
          if (o < 0) {
            payload = Py_None;
            Py_INCREF(payload);
          } else if (ln < 0 || o + ln > src->blob_len) {
            PyErr_Format(PyExc_IndexError,
                         "arena payload outside blob (slot=%d, vid=%d)",
                         (int)sl, (int)vv);
            goto fail;
          } else {
            payload = PyBytes_FromStringAndSize(src->blob + o, (Py_ssize_t)ln);
            if (!payload) goto fail;
          }
        }
        PyObject *inner = PyTuple_New(4);
        if (!inner) { Py_DECREF(payload); goto fail; }
        PyObject *g = PyLong_FromLongLong(gid[at]);
        PyObject *s = PyFloat_FromDouble((double)score[at]);
        PyObject *d = PyFloat_FromDouble((double)dist[at]);
        if (!g || !s || !d) {
          Py_XDECREF(g); Py_XDECREF(s); Py_XDECREF(d); Py_DECREF(inner);
          Py_DECREF(payload);
          goto fail;
        }
        PyTuple_SET_ITEM(inner, 0, g);
        PyTuple_SET_ITEM(inner, 1, s);
        PyTuple_SET_ITEM(inner, 2, d);
        PyTuple_SET_ITEM(inner, 3, payload); /* steals our new ref */
        /* tuple.__new__(cls, inner): C-speed construction of the
         * namedtuple instance, bypassing its Python __new__ */
        PyObject *newargs = PyTuple_Pack(1, inner);
        Py_DECREF(inner);
        if (!newargs) goto fail;
        PyObject *res = PyTuple_Type.tp_new((PyTypeObject *)cls, newargs, NULL);
        Py_DECREF(newargs);
        if (!res) goto fail;
        if (PyList_Append(row, res) != 0) {
          Py_DECREF(res);
          goto fail;
        }
        Py_DECREF(res);
      }
    }
  }
  goto done;
fail:
  Py_CLEAR(out);
done:
  if (srcs) {
    for (Py_ssize_t i = 0; i < n_srcs; i++) release_slot_src(&srcs[i]);
    PyMem_Free(srcs);
  }
  for (int i = 0; i < 6; i++)
    if (hb[i].held) PyBuffer_Release(&hb[i].buf);
  return out;
}

static PyMethodDef methods[] = {
    {"build_results", build_results, METH_VARARGS,
     "Batch-construct per-query SearchResult lists from merged planes."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_vsresults",
                                       NULL, -1, methods};

PyMODINIT_FUNC PyInit__vsresults(void) { return PyModule_Create(&moduledef); }
