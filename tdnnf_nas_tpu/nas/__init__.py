from tdnnf_nas_tpu.nas.search import (
    temperature_at,
    beam_search_archs,
    extract_offsets,
    extract_bottlenecks,
    child_config_from_arch,
    arch_param_count,
)
