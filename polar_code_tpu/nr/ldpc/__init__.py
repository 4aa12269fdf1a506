from .basegraphs import BaseGraph, load_base_graph
from .builder import build_h_matrix
from .encode import encode_ldpc, encode_ldpc_batch, parity_solver_matrix
from .rate_match import rate_match_ldpc, derate_match_ldpc
from .decode_nms import decode_ldpc_nms, decode_ldpc_nms_batch

__all__ = [
    "BaseGraph",
    "load_base_graph",
    "build_h_matrix",
    "encode_ldpc",
    "encode_ldpc_batch",
    "parity_solver_matrix",
    "rate_match_ldpc",
    "derate_match_ldpc",
    "decode_ldpc_nms",
    "decode_ldpc_nms_batch",
]
