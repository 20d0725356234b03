/* fastgraph — native graph construction for opt_tpu.
 *
 * Native-code replacement for the reference's C++ graph building
 * (examples/shared/OptGraph.h:64-75 createGraphFromNeighborLists and the
 * per-example edge assembly): builds deduplicated directed edge lists from
 * triangle faces, and CSR adjacency from edge lists, in C. opt_tpu.utils.io
 * uses it when built, with a numpy fallback otherwise.
 *
 * Pure CPython C API (no pybind11 in this environment); inputs/outputs are
 * int32 buffers via the buffer protocol.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static int cmp_u64(const void* a, const void* b) {
    uint64_t x = *(const uint64_t*)a, y = *(const uint64_t*)b;
    return x < y ? -1 : (x > y ? 1 : 0);
}

/* build_edges(faces: int32 buffer of length 3*F) -> (bytes v0, bytes v1)
 * Directed edges both ways, deduplicated and sorted. */
static PyObject* build_edges(PyObject* self, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return NULL;
    if (buf.len % (3 * (Py_ssize_t)sizeof(int32_t)) != 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "faces buffer must be int32 [F,3]");
        return NULL;
    }
    Py_ssize_t F = buf.len / (3 * sizeof(int32_t));
    const int32_t* f = (const int32_t*)buf.buf;

    uint64_t* keys = (uint64_t*)malloc(sizeof(uint64_t) * 6 * (size_t)F);
    if (!keys) {
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    size_t n = 0;
    for (Py_ssize_t i = 0; i < F; ++i) {
        int32_t a = f[3 * i], b = f[3 * i + 1], c = f[3 * i + 2];
        const int32_t pairs[6][2] = {{a, b}, {b, a}, {b, c}, {c, b}, {c, a}, {a, c}};
        for (int k = 0; k < 6; ++k) {
            keys[n++] = ((uint64_t)(uint32_t)pairs[k][0] << 32) |
                        (uint64_t)(uint32_t)pairs[k][1];
        }
    }
    PyBuffer_Release(&buf);

    qsort(keys, n, sizeof(uint64_t), cmp_u64);
    size_t m = 0;
    for (size_t i = 0; i < n; ++i) {
        if (i == 0 || keys[i] != keys[i - 1]) keys[m++] = keys[i];
    }

    PyObject* v0 = PyBytes_FromStringAndSize(NULL, m * sizeof(int32_t));
    PyObject* v1 = PyBytes_FromStringAndSize(NULL, m * sizeof(int32_t));
    if (!v0 || !v1) {
        free(keys);
        Py_XDECREF(v0);
        Py_XDECREF(v1);
        return NULL;
    }
    int32_t* p0 = (int32_t*)PyBytes_AsString(v0);
    int32_t* p1 = (int32_t*)PyBytes_AsString(v1);
    for (size_t i = 0; i < m; ++i) {
        p0[i] = (int32_t)(keys[i] >> 32);
        p1[i] = (int32_t)(keys[i] & 0xffffffffu);
    }
    free(keys);
    return Py_BuildValue("(NN)", v0, v1);
}

/* csr_from_edges(v0 buffer, v1 buffer, num_vertices)
 * -> (bytes row_ptr [N+1], bytes col_idx [E]) — the neighbor-list format the
 * reference converts from (OptGraph.h:64-75). Edges must be sorted by v0
 * (build_edges output is). */
static PyObject* csr_from_edges(PyObject* self, PyObject* args) {
    Py_buffer b0, b1;
    int n_vertices;
    if (!PyArg_ParseTuple(args, "y*y*i", &b0, &b1, &n_vertices)) return NULL;
    if (b0.len != b1.len || b0.len % sizeof(int32_t) != 0) {
        PyBuffer_Release(&b0);
        PyBuffer_Release(&b1);
        PyErr_SetString(PyExc_ValueError, "edge buffers must be equal-length int32");
        return NULL;
    }
    Py_ssize_t E = b0.len / sizeof(int32_t);
    const int32_t* v0 = (const int32_t*)b0.buf;
    const int32_t* v1 = (const int32_t*)b1.buf;

    PyObject* rp = PyBytes_FromStringAndSize(NULL, (n_vertices + 1) * sizeof(int32_t));
    PyObject* ci = PyBytes_FromStringAndSize(NULL, E * sizeof(int32_t));
    if (!rp || !ci) {
        PyBuffer_Release(&b0);
        PyBuffer_Release(&b1);
        Py_XDECREF(rp);
        Py_XDECREF(ci);
        return NULL;
    }
    int32_t* row = (int32_t*)PyBytes_AsString(rp);
    int32_t* col = (int32_t*)PyBytes_AsString(ci);
    memset(row, 0, (n_vertices + 1) * sizeof(int32_t));
    for (Py_ssize_t i = 0; i < E; ++i) {
        if (v0[i] < 0 || v0[i] >= n_vertices) {
            PyBuffer_Release(&b0);
            PyBuffer_Release(&b1);
            Py_DECREF(rp);
            Py_DECREF(ci);
            PyErr_SetString(PyExc_ValueError, "edge index out of range");
            return NULL;
        }
        row[v0[i] + 1]++;
        col[i] = v1[i];
    }
    for (int i = 0; i < n_vertices; ++i) row[i + 1] += row[i];
    PyBuffer_Release(&b0);
    PyBuffer_Release(&b1);
    return Py_BuildValue("(NN)", rp, ci);
}

static PyMethodDef methods[] = {
    {"build_edges", build_edges, METH_VARARGS,
     "build_edges(faces_int32_buffer) -> (v0_bytes, v1_bytes)"},
    {"csr_from_edges", csr_from_edges, METH_VARARGS,
     "csr_from_edges(v0, v1, num_vertices) -> (row_ptr_bytes, col_idx_bytes)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moddef = {
    PyModuleDef_HEAD_INIT, "opt_tpu_fastgraph",
    "Native graph construction for opt_tpu", -1, methods,
};

PyMODINIT_FUNC PyInit_opt_tpu_fastgraph(void) {
    return PyModule_Create(&moddef);
}
