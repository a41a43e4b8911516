from tdnnf_nas_tpu.frontend.features import (
    FbankConfig,
    MfccConfig,
    FrontendConfig,
    compute_fbank,
    compute_mfcc,
    mel_filterbank,
    frame_signal,
    num_frames,
    cmvn,
    sliding_cmn,
)
from tdnnf_nas_tpu.frontend.speed_perturb import speed_perturb
