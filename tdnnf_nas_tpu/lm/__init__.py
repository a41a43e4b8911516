from tdnnf_nas_tpu.lm.ngram import NGramLM, estimate_ngram_lm
