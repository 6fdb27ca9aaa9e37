from recommendar_systems_tpu.graph.sparse import COO, ELL, spmm, spmm_coo, spmm_ell
from recommendar_systems_tpu.graph.build import (
    build_norm_adj,
    build_norm_ui,
    build_edge_info,
)
from recommendar_systems_tpu.graph.knn import build_knn_ell, knn_normalized_ell
