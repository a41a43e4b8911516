from tdnnf_nas_tpu.graphs.fsa import StateGraph, stationary_init
from tdnnf_nas_tpu.graphs.topology import ChainTopology, ContextIndependentTree, BiphoneTree
from tdnnf_nas_tpu.graphs.phone_lm import PhoneLM, estimate_phone_lm
from tdnnf_nas_tpu.graphs.den_graph import build_denominator_graph, den_init_lookup
from tdnnf_nas_tpu.graphs.supervision import (
    ChunkSupervision,
    numerator_graph,
    tolerance_mask,
    make_chunk_supervision,
    stack_supervisions,
)
from tdnnf_nas_tpu.graphs.tree_cluster import (
    ClusteredBiphoneTree,
    TreeStats,
    accumulate_tree_stats,
    build_clustered_tree,
    build_tree_from_corpus,
)
