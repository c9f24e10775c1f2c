from haconvdr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from haconvdr_tpu.parallel.sharded_search import ShardedIndex, sharded_topk  # noqa: F401
from haconvdr_tpu.parallel.sharded_encode import (  # noqa: F401
    encoder_param_pspecs,
    make_sharded_encode_fn,
)
