from tdnnf_nas_tpu.decode.viterbi import viterbi_decode, path_to_phones
from tdnnf_nas_tpu.decode.scoring import edit_distance, wer, score_corpus
