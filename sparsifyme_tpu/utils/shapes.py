"""Layer-shape records and CSV IO.

TPU-native equivalent of the reference's shape plumbing:
`util::read_shapes` CSV parser (reference `include/sparsify.me/util/util.hxx:36-61`)
and the `m,n,k,b` CSV contract used by `datasets/*.csv` and
`examples/profiling.py:4-17`.

The CSV schema is `m,n,k,b` with a header row. `m` is the im2col patch count
(output H*W of a conv), `n` the output channels, `k` = in_ch*kh*kw, and `b`
the batch size (32 in all bundled datasets).
"""

from __future__ import annotations

import csv
import io
from typing import Iterable, List, NamedTuple


class LayerShape(NamedTuple):
    """One GEMM problem shape derived from a conv layer (im2col)."""

    m: int
    n: int
    k: int
    b: int

    @property
    def flops(self) -> int:
        """Dense-equivalent FLOPs for the full batched matmul."""
        return 2 * self.m * self.n * self.k * self.b

    def nnz(self, sparsity: float = 0.5) -> int:
        """Nonzeros of the batched sparse operand A at a given sparsity."""
        return int(self.m * self.k * self.b * (1.0 - sparsity))


def read_shapes(path_or_text: str) -> List[LayerShape]:
    """Parse an ``m,n,k,b`` CSV (header skipped) into LayerShapes.

    Mirrors the capability of ``util::read_shapes``
    (reference ``util/util.hxx:36-61``): skips the header line, one shape
    per data row.  Accepts either a filesystem path or raw CSV text.
    """
    if "\n" in path_or_text or "," in path_or_text and not _looks_like_path(
        path_or_text
    ):
        f = io.StringIO(path_or_text)
        return _parse(f)
    with open(path_or_text, "r") as f:
        return _parse(f)


def _looks_like_path(s: str) -> bool:
    return "\n" not in s and (s.endswith(".csv") or "/" in s)


def _parse(f) -> List[LayerShape]:
    reader = csv.reader(f)
    rows: List[LayerShape] = []
    for i, row in enumerate(reader):
        if not row:
            continue
        if i == 0:
            # Header row ("m,n,k,b") — skip, as the reference parser does.
            try:
                int(row[0])
            except ValueError:
                continue
        m, n, k, b = (int(x) for x in row[:4])
        rows.append(LayerShape(m, n, k, b))
    return rows


def write_shapes(path: str, shapes: Iterable[LayerShape]) -> None:
    """Write shapes to the ``m,n,k,b`` CSV schema (with header)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["m", "n", "k", "b"])
        for s in shapes:
            w.writerow([s.m, s.n, s.k, s.b])
