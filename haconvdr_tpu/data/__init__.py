from haconvdr_tpu.data.sequence import (  # noqa: F401
    pad_seq_to_length,
    ConcatBuilder,
)
from haconvdr_tpu.data.loader import batch_iter, collate  # noqa: F401
