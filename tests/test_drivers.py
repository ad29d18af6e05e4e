"""CLI driver entry points: stdout contracts (reference examples/ layer).

Each driver must print a single parseable elapsed-ms float
(`examples/sparsify.cu:54` etc.); spmma prints the three labeled phase
timings (`examples/spmma.cu:61-66`). Exercised via the Python entry the
native binaries embed (`sparsifyme_tpu.bench.drivers.run`).
"""

import io
from contextlib import redirect_stdout

import pytest

from sparsifyme_tpu.bench import drivers


def _capture(kernel, *args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        drivers.run(kernel, *args)
    return buf.getvalue().strip().splitlines()


@pytest.mark.parametrize("kernel", ["gemm", "spmm", "batched_coo"])
def test_single_float_contract(kernel):
    lines = _capture(kernel, 32, 16, 64, 2)
    assert len(lines) == 1
    assert float(lines[0]) >= 0.0


def test_sparsify_contract():
    lines = _capture("sparsify", 32, 64)
    assert len(lines) == 1
    assert float(lines[0]) >= 0.0


def test_spmma_three_phase_contract():
    lines = _capture("spmma", 32, 16, 64, 2)
    assert [ln.split(":")[0] for ln in lines] == [
        "Prune time", "Compress time", "Matmul time",
    ]
    for ln in lines:
        assert float(ln.split(":")[1]) >= 0.0


def test_main_argv():
    with pytest.raises(SystemExit):
        drivers.main(["gemm"])  # wrong arity
    buf = io.StringIO()
    with redirect_stdout(buf):
        drivers.main(["gemm", "16", "16", "32", "2"])
    assert float(buf.getvalue().strip()) >= 0.0
