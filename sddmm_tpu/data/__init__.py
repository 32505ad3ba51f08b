from sddmm_tpu.data.sparse import CSR, COO
from sddmm_tpu.data import io as io
from sddmm_tpu.data import generate as generate

__all__ = ["CSR", "COO", "io", "generate"]
