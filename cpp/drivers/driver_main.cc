// Native CLI drivers for sparsify.me-TPU.
//
// One binary per kernel, mirroring the reference's L3 driver layer
// (examples/{sparsify,gemm,spmm,spmma,batched_coo}.cu — SURVEY.md
// C8-C12): positional argv, a single elapsed-ms float on stdout
// (machine-readable by the benchmark harness, profiling.py:8-17).
// The kernel is selected by -DSM_KERNEL at compile time; the compute
// path runs on TPU through the embedded CPython runtime (the TPU-native
// equivalent slot of the reference's in-process CUDA launches).
//
// Usage (argv contracts match the reference drivers):
//   sparsify m n            (examples/sparsify.cu:22)
//   gemm m n k b            (examples/gemm.cu:24)
//   spmm m n k b            (examples/spmm.cu:29)
//   spmma m n k b           (examples/spmma.cu:31)
//   batched_coo m n k b     (examples/batched_coo.cu:34)

#include <Python.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>

#ifndef SM_KERNEL
#define SM_KERNEL "gemm"
#endif

namespace {

int fail(const char* msg) {
  std::fprintf(stderr, "%s\n", msg);
  return EXIT_FAILURE;
}

}  // namespace

int main(int argc, char** argv) {
  const std::string kernel = SM_KERNEL;
  const bool two_args = kernel == "sparsify";
  const int need = two_args ? 3 : 5;
  if (argc != need) {
    std::fprintf(stderr, "usage: %s m n%s\n", argv[0],
                 two_args ? "" : " k b");
    return EXIT_FAILURE;
  }
  long m = std::strtol(argv[1], nullptr, 10);
  long n = std::strtol(argv[2], nullptr, 10);
  long k = two_args ? 0 : std::strtol(argv[3], nullptr, 10);
  long b = two_args ? 1 : std::strtol(argv[4], nullptr, 10);
  if (m <= 0 || n <= 0 || (!two_args && (k <= 0 || b <= 0)))
    return fail("arguments must be positive integers");

  PyConfig config;
  PyConfig_InitPythonConfig(&config);
  // Resolve the venv interpreter so site-packages (jax, the TPU plugin
  // sitecustomize via PYTHONPATH) are importable from the embedded
  // runtime. Overridable for non-standard layouts.
  const char* py = std::getenv("SPARSIFYME_PYTHON");
  if (!py) py = "/opt/venv/bin/python3";
  PyStatus st = PyConfig_SetBytesString(&config, &config.program_name, py);
  if (PyStatus_Exception(st)) return fail("PyConfig program_name failed");
  st = Py_InitializeFromConfig(&config);
  PyConfig_Clear(&config);
  if (PyStatus_Exception(st)) return fail("Python init failed");

  // The driver entry (sparsifyme_tpu.bench.drivers.run) owns shape
  // setup, warmup exclusion, timing, and the stdout contract.
  char snippet[512];
  std::snprintf(snippet, sizeof(snippet),
                "import sys\n"
                "sys.path.insert(0, '')\n"
                "from sparsifyme_tpu.bench.drivers import run\n"
                "run('%s', m=%ld, n=%ld, k=%ld, b=%ld)\n",
                kernel.c_str(), m, n, k, b);
  int rc = PyRun_SimpleString(snippet);
  if (Py_FinalizeEx() < 0) rc = 1;
  return rc == 0 ? EXIT_SUCCESS : EXIT_FAILURE;
}
