from tdnnf_nas_tpu.graphs.fsa import StateGraph, stationary_init
from tdnnf_nas_tpu.graphs.topology import (
    ChainTopology,
    ContextIndependentTree,
    BiphoneTree,
    TriphoneTree,
    CrossTriphoneTree,
)
from tdnnf_nas_tpu.graphs.phone_lm import (
    PhoneLM,
    NGramPhoneLM,
    estimate_phone_lm,
    estimate_ngram_phone_lm,
)
from tdnnf_nas_tpu.graphs.den_graph import (
    build_denominator_graph,
    den_init_lookup,
    compile_denominator_fsa,
    CompiledDenFsa,
)
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
    TriphoneStats,
    accumulate_tree_stats,
    accumulate_triphone_stats,
    build_clustered_tree,
    build_clustered_triphone_tree,
    accumulate_cross_triphone_stats,
    build_clustered_cross_triphone_tree,
    build_tree_from_corpus,
)
