from sddmm_tpu.models.block_sparse_attention import (BlockSparseAttention,
                                                     make_attention_mask)
from sddmm_tpu.models.factorization import SparseFactorizationModel
from sddmm_tpu.models.graph_attention import GraphAttentionLayer

__all__ = ["SparseFactorizationModel", "GraphAttentionLayer",
           "BlockSparseAttention", "make_attention_mask"]
