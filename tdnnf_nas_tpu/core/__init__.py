from tdnnf_nas_tpu.core.config import Config, asdict_config, config_from_dict
from tdnnf_nas_tpu.core.prng import KeySeq
