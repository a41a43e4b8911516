from tdnnf_nas_tpu.recipes.chain_recipes import (
    DataBundle,
    bootstrap_alignments_gmm,
    prepare_data,
    train_model,
    decode_corpus,
    run_offset_search_pipeline,
    run_bottleneck_search_pipeline,
)
