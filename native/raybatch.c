/* Native ray-batch kernel for the host-side input pipeline.
 *
 * Replaces the reference's numba-jitted _compute_direction
 * (autolabel/dataset.py:17-37) with a real C extension (CPython C API +
 * NumPy): per-pixel camera-ray directions, norms and the world rotation,
 * fused in one pass. The TPU never sees this — it runs in the data
 * loader thread feeding the device queue, so single-core throughput here
 * directly bounds the train-step issue rate on many-frame scenes.
 *
 * Build: python setup.py build_ext --inplace (see setup.py).
 * autolabel_tpu/core/rays.py falls back to vectorized numpy when the
 * extension is absent.
 */
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <math.h>
#include <numpy/arrayobject.h>

/* compute_directions(R_WC (3,3) f32/f64, ray_indices (N,) i64, w, fx, fy,
 * cx, cy, xs_jitter or None, ys_jitter or None) -> (dirs (N,3) f32,
 * norms (N,1) f32)
 *
 * Jitter arrays (f32 in [0,1)) come from the caller's RNG so determinism
 * semantics match the numpy path exactly; None means pixel centers. */
static PyObject *compute_directions(PyObject *self, PyObject *args) {
  PyObject *r_obj, *idx_obj, *xs_obj, *ys_obj;
  long w;
  double fx, fy, cx, cy;
  if (!PyArg_ParseTuple(args, "OOlddddOO", &r_obj, &idx_obj, &w, &fx, &fy,
                        &cx, &cy, &xs_obj, &ys_obj))
    return NULL;

  PyArrayObject *R = (PyArrayObject *)PyArray_FROM_OTF(
      r_obj, NPY_FLOAT64, NPY_ARRAY_IN_ARRAY);
  PyArrayObject *idx = (PyArrayObject *)PyArray_FROM_OTF(
      idx_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
  if (!R || !idx) {
    Py_XDECREF(R);
    Py_XDECREF(idx);
    return NULL;
  }
  PyArrayObject *xsj = NULL, *ysj = NULL;
  if (xs_obj != Py_None) {
    xsj = (PyArrayObject *)PyArray_FROM_OTF(xs_obj, NPY_FLOAT32,
                                            NPY_ARRAY_IN_ARRAY);
    ysj = (PyArrayObject *)PyArray_FROM_OTF(ys_obj, NPY_FLOAT32,
                                            NPY_ARRAY_IN_ARRAY);
    if (!xsj || !ysj) {
      Py_DECREF(R);
      Py_DECREF(idx);
      Py_XDECREF(xsj);
      Py_XDECREF(ysj);
      return NULL;
    }
  }

  npy_intp n = PyArray_DIM(idx, 0);
  npy_intp dims2[2] = {n, 3};
  npy_intp dims1[2] = {n, 1};
  PyArrayObject *dirs =
      (PyArrayObject *)PyArray_SimpleNew(2, dims2, NPY_FLOAT32);
  PyArrayObject *norms =
      (PyArrayObject *)PyArray_SimpleNew(2, dims1, NPY_FLOAT32);
  if (!dirs || !norms) {
    Py_DECREF(R);
    Py_DECREF(idx);
    Py_XDECREF(xsj);
    Py_XDECREF(ysj);
    Py_XDECREF(dirs);
    Py_XDECREF(norms);
    return NULL;
  }

  const double *r = (const double *)PyArray_DATA(R);
  const long long *pix = (const long long *)PyArray_DATA(idx);
  const float *jx = xsj ? (const float *)PyArray_DATA(xsj) : NULL;
  const float *jy = ysj ? (const float *)PyArray_DATA(ysj) : NULL;
  float *out_d = (float *)PyArray_DATA(dirs);
  float *out_n = (float *)PyArray_DATA(norms);

  Py_BEGIN_ALLOW_THREADS;
  for (npy_intp i = 0; i < n; ++i) {
    const double xi = (double)(pix[i] % w);
    const double yi = (double)(pix[i] / w);
    const double px = xi + (jx ? (double)jx[i] : 0.5);
    const double py = yi + (jy ? (double)jy[i] : 0.5);
    const double dx = (px - cx) / fx;
    const double dy = (py - cy) / fy;
    const double norm = sqrt(dx * dx + dy * dy + 1.0);
    const double inv = 1.0 / norm;
    const double ux = dx * inv, uy = dy * inv, uz = inv;
    /* world = R_WC @ unit_camera_ray */
    out_d[3 * i + 0] = (float)(r[0] * ux + r[1] * uy + r[2] * uz);
    out_d[3 * i + 1] = (float)(r[3] * ux + r[4] * uy + r[5] * uz);
    out_d[3 * i + 2] = (float)(r[6] * ux + r[7] * uy + r[8] * uz);
    out_n[i] = (float)norm;
  }
  Py_END_ALLOW_THREADS;

  Py_DECREF(R);
  Py_DECREF(idx);
  Py_XDECREF(xsj);
  Py_XDECREF(ysj);
  return Py_BuildValue("(NN)", dirs, norms);
}

static PyMethodDef Methods[] = {
    {"compute_directions", compute_directions, METH_VARARGS,
     "Per-pixel world-space ray directions and norms."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_raybatch",
                                       "Native ray-batch kernels", -1,
                                       Methods};

PyMODINIT_FUNC PyInit__raybatch(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
