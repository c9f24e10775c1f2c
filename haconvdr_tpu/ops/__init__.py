from haconvdr_tpu.ops.topk import (  # noqa: F401
    exact_topk_oracle,
    topk_block,
    merge_topk,
    BlockSearcher,
)
