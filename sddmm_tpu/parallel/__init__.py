from sddmm_tpu.parallel.mesh import make_mesh
from sddmm_tpu.parallel.dist import DistributedHybridSDDMM

__all__ = ["make_mesh", "DistributedHybridSDDMM"]
