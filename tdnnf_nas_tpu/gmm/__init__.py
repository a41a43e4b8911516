from tdnnf_nas_tpu.gmm.gmm import (
    DiagGmm,
    AmGmm,
    MonoHmmConfig,
    train_mono,
    train_tri,
    viterbi_align_gmm,
    corpus_loglike,
)
from tdnnf_nas_tpu.gmm.transforms import (
    splice_frames,
    estimate_lda,
    estimate_mllt,
    estimate_fmllr,
    apply_fmllr,
)
from tdnnf_nas_tpu.gmm.ladder import GmmLadderConfig, run_gmm_ladder
