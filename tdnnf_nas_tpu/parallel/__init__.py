from tdnnf_nas_tpu.parallel.mesh import (
    make_mesh,
    dp_sharding,
    replicated_sharding,
    put_replicated,
    put_batch,
    compress_batch_bf16,
    prefetch_to_device,
)
