from tdnnf_nas_tpu.models.tdnnf import (
    TdnnfModelConfig,
    init_model,
    apply_model,
    model_context,
    chunk_input_frames,
    count_params,
    estimate_lda,
)
from tdnnf_nas_tpu.models.nas import (
    DartsModelConfig,
    SearchMode,
    init_supernet,
    apply_supernet,
    branch_coefs,
    supernet_context,
)
