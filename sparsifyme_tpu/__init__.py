"""sparsifyme_tpu — a TPU-native sparse deep-learning kernel library.

Built from scratch in JAX/XLA/Pallas with the capability set of
owensgroup/sparsify.me (see SURVEY.md): block-structured and 2:4 magnitude
pruning with structural validation, a prune -> compress -> matmul
structured-sparse pipeline with plan caching, batched Blocked-ELL and
shared-operand COO SpMM, batched dense GEMM baselines, multi-chip sharding,
and a benchmark harness over the ResNet-18/34/50/101/152 im2col layer
shapes.
"""

from .containers import BlockedEll, Coo, Sparse24
from .ops.gemm import batched_gemm, gemm_bf16, gemm_f32, gemm_f64
from .ops.prune import (
    prune_24,
    prune_block_magnitude,
    prune_block_topk,
    prune_check_24,
    prune_check_nm,
    prune_nm,
    prune_threshold,
)
from .ops.coo import coo_from_dense, coo_to_dense, spmm_coo
from .ops.ell import ell_from_dense, ell_to_dense, spmm_ell
from .ops.sparse24 import (
    compress_24,
    decompress_24,
    pack_codes,
    spmm_24,
    spmm_24_reference,
    unpack_codes,
)
from .plan import SpmmaConfig, SpmmaPlan, get_plan, spmma
from .utils.shapes import LayerShape, read_shapes, write_shapes

__version__ = "0.1.0"

__all__ = [
    "BlockedEll",
    "Coo",
    "Sparse24",
    "LayerShape",
    "SpmmaConfig",
    "SpmmaPlan",
    "batched_gemm",
    "compress_24",
    "coo_from_dense",
    "coo_to_dense",
    "decompress_24",
    "ell_from_dense",
    "ell_to_dense",
    "gemm_bf16",
    "gemm_f32",
    "gemm_f64",
    "get_plan",
    "pack_codes",
    "prune_24",
    "prune_block_magnitude",
    "prune_block_topk",
    "prune_check_24",
    "prune_check_nm",
    "prune_nm",
    "prune_threshold",
    "read_shapes",
    "spmm_24",
    "spmm_24_reference",
    "spmm_coo",
    "spmm_ell",
    "spmma",
    "unpack_codes",
    "write_shapes",
]
