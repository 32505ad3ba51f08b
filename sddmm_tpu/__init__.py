"""sddmm_tpu — a TPU-native SDDMM framework with BSMR-style reordering.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
CX9898/sddmm-gpu reference (BSMR: Block-wise Similarity-based Matrix
Reordering + hybrid dense-block / sparse-residual SDDMM kernels).

Layer map (TPU-first, not a port):

- ``sddmm_tpu.data``     — matrix containers, Matrix Market / DLMC / SNAP IO,
  random generators (reference: src/Matrix.cpp, include/Matrix.hpp).
- ``sddmm_tpu.reorder``  — BSMR row clustering + column dense/sparse split +
  device packing (reference: src/rowReordering.cu, src/colReordering.cu,
  src/BSMR.cpp).
- ``sddmm_tpu.ops``      — compute paths: pure-JAX CSR SDDMM (the
  cuSPARSE-equivalent baseline), hybrid dense-block + residual SDDMM on the
  MXU, Pallas fused kernels, batched SDDMM, SpMM (reference:
  src/sddmmKernel.cu, include/cuSparseSDDMM.cuh).
- ``sddmm_tpu.parallel`` — multi-chip sharding of the hybrid SDDMM over a
  ``jax.sharding.Mesh`` (new capability; the reference is single-GPU).
- ``sddmm_tpu.models``   — model families built on the ops: sparse matrix
  factorization (ALS-style training), graph attention, and block-sparse
  transformer attention (sliding-window + global-token masks).
- ``sddmm_tpu.utils``    — logger ([key : value] format compatible with the
  reference's analyze_results schema), timing, tolerance checks, options,
  persistent compilation cache, checkpoint/resume (orbax).
- ``sddmm_tpu.native``   — optional C++ (OpenMP) host preprocessing
  accelerators with pure-Python fallbacks.
"""

from sddmm_tpu import config as config
from sddmm_tpu.data.sparse import CSR, COO
from sddmm_tpu.ops.reference import sddmm_reference
from sddmm_tpu.ops.csr_sddmm import csr_sddmm
from sddmm_tpu.reorder.bsmr import BSMR
from sddmm_tpu.reorder.pack import PackedMatrix, pack
from sddmm_tpu.ops.hybrid import sddmm_hybrid, HybridSDDMM

__version__ = "0.1.0"

__all__ = [
    "CSR",
    "COO",
    "BSMR",
    "PackedMatrix",
    "pack",
    "sddmm_reference",
    "csr_sddmm",
    "sddmm_hybrid",
    "HybridSDDMM",
    "config",
    "__version__",
]
