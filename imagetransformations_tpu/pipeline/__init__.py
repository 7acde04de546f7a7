from imagetransformations_tpu.pipeline.chain import Chain, OpSpec, build_chain_fn  # noqa: F401
from imagetransformations_tpu.pipeline.batch import (  # noqa: F401
    apply_all_transformations,
    transform_batch,
)
from imagetransformations_tpu.pipeline.sharding import (  # noqa: F401
    data_mesh,
    shard_images,
    sharded_apply,
)
from imagetransformations_tpu.pipeline.io import (  # noqa: F401
    global_batch_from_host_shards,
    load_folder_images,
    prefetch_to_device,
    shard_files_for_host,
)
