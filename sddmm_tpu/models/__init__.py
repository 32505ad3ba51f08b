from sddmm_tpu.models.factorization import SparseFactorizationModel
from sddmm_tpu.models.graph_attention import GraphAttentionLayer

__all__ = ["SparseFactorizationModel", "GraphAttentionLayer"]
