/* Batch PyLong <-> little-endian byte-array converters.
 *
 * Separate from ligero_host.cpp on purpose: this unit includes Python.h
 * (loaded via ctypes.PyDLL so the GIL is held around every call), while
 * the host kernel library stays interpreter-free.
 *
 * Why it exists: the prover's opened-column conversion
 * (field.limbs_to_ints over ~1.4M elements at 2^19) and the verifier's
 * column re-serialization (hashes.serialize_field_vec) spend ~1s/proof
 * in Python-level int.from_bytes / int.to_bytes loops.  The CPython
 * private _PyLong_FromByteArray/_PyLong_AsByteArray calls do the same
 * work ~10x faster (measured 0.98s -> 0.09s at the 2^19 opening shape).
 * Pure-Python fallbacks remain in fields.py / hashes.py.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#ifdef __cplusplus
extern "C" {
#endif

/* contiguous little-endian fixed-width unsigned elements -> new list of
 * Python ints.  buf has n*width bytes. */
PyObject *lp_longs_from_le(const unsigned char *buf, Py_ssize_t n,
                           Py_ssize_t width) {
    PyObject *list = PyList_New(n);
    if (!list) return NULL;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = _PyLong_FromByteArray(buf + i * width, (size_t)width,
                                            /*little_endian=*/1,
                                            /*is_signed=*/0);
        if (!v) { Py_DECREF(list); return NULL; }
        PyList_SET_ITEM(list, i, v);
    }
    return list;
}

/* sequence of non-negative ints -> caller buffer of len(seq)*width bytes,
 * little-endian fixed width.  Matches int.to_bytes(width, "little")
 * semantics: OverflowError if a value does not fit, accepts any object
 * supporting __index__.  Returns 0 on success, -1 with an exception set
 * on error (the ctypes PyDLL wrapper re-raises it). */
int lp_le_from_longs(PyObject *seq, Py_ssize_t width, unsigned char *out) {
    PyObject *fast = PySequence_Fast(seq, "expected a sequence of ints");
    if (!fast) return -1;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    PyObject **items = PySequence_Fast_ITEMS(fast);
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *v = items[i];
        PyObject *idx = NULL;
        if (!PyLong_CheckExact(v)) {      /* numpy ints etc. */
            idx = PyNumber_Index(v);
            if (!idx) { Py_DECREF(fast); return -1; }
            v = idx;
        }
#if PY_VERSION_HEX >= 0x030D0000
        int rc = _PyLong_AsByteArray((PyLongObject *)v, out + i * width,
                                     (size_t)width, 1, 0, 1);
#else
        int rc = _PyLong_AsByteArray((PyLongObject *)v, out + i * width,
                                     (size_t)width, 1, 0);
#endif
        Py_XDECREF(idx);
        if (rc < 0) { Py_DECREF(fast); return -1; }
    }
    Py_DECREF(fast);
    return 0;
}

#ifdef __cplusplus
}  /* extern "C" */
#endif
