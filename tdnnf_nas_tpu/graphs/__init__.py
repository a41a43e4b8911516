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
