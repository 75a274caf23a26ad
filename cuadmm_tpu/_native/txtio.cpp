/*
 * Fast whitespace-separated float parser for the TXT problem format.
 *
 * Native counterpart of the reference's C++ IO layer
 * (reference: src/utils/io.cu:20-132 -- ifstream >> double loops).
 * The big SPOT/plato At.txt files run to millions of lines; istream-style
 * parsing in Python is 20-50x slower than this single-pass strtod scan.
 *
 * Exposes: txtio.read_floats(path) -> 1-D float64 ndarray of every number
 * in the file, in order. Python-side code reshapes into triplets.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

static PyObject* read_floats(PyObject* self, PyObject* args) {
    const char* path;
    if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

    FILE* f = fopen(path, "rb");
    if (!f) {
        PyErr_Format(PyExc_FileNotFoundError, "could not open '%s'", path);
        return nullptr;
    }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(static_cast<size_t>(size) + 1);
    size_t got = fread(buf.data(), 1, static_cast<size_t>(size), f);
    fclose(f);
    buf[got] = '\0';

    std::vector<double> vals;
    vals.reserve(got / 8 + 16);
    const char* p = buf.data();
    const char* end = buf.data() + got;
    while (p < end) {
        char* next = nullptr;
        errno = 0;
        double v = strtod(p, &next);
        if (next == p) {
            // Not a number here: skip one byte (handles stray characters
            // the same way `file >> val` would terminate; we skip instead
            // so malformed separators don't truncate the file).
            ++p;
            continue;
        }
        vals.push_back(v);
        p = next;
    }

    npy_intp n = static_cast<npy_intp>(vals.size());
    PyObject* arr = PyArray_SimpleNew(1, &n, NPY_FLOAT64);
    if (!arr) return nullptr;
    memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), vals.data(),
           vals.size() * sizeof(double));
    return arr;
}

static PyMethodDef Methods[] = {
    {"read_floats", read_floats, METH_VARARGS,
     "Parse every whitespace-separated float in a file into a float64 array."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "txtio", nullptr, -1, Methods,
};

PyMODINIT_FUNC PyInit_txtio(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
