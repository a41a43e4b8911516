from tdnnf_nas_tpu.data.synthetic import SyntheticCorpusConfig, make_synthetic_corpus
from tdnnf_nas_tpu.data.egs import EgsConfig, make_egs, batch_iterator, Chunk
