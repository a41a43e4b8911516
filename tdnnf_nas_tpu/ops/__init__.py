from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays, forward_score, occupancy_posteriors
from tdnnf_nas_tpu.ops.tdnn import spliced_linear
from tdnnf_nas_tpu.ops.semiorth import semi_orthogonal_step, orthonormality_error
