from sddmm_tpu.ops.reference import sddmm_reference
from sddmm_tpu.ops.csr_sddmm import csr_sddmm, csr_sddmm_jax
from sddmm_tpu.ops.hybrid import sddmm_hybrid, HybridSDDMM
from sddmm_tpu.ops.dense import dense_masked_sddmm
from sddmm_tpu.ops.spmm import csr_spmm
from sddmm_tpu.ops.batch import batched_csr_sddmm, batched_transpose

__all__ = [
    "sddmm_reference",
    "csr_sddmm",
    "csr_sddmm_jax",
    "sddmm_hybrid",
    "HybridSDDMM",
    "dense_masked_sddmm",
    "csr_spmm",
    "batched_csr_sddmm",
    "batched_transpose",
]
