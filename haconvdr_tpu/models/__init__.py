from haconvdr_tpu.models.encoder import (  # noqa: F401
    AnceEncoder,
    EncoderParams,
    init_encoder_params,
    encode,
)
from haconvdr_tpu.models.hf_import import (  # noqa: F401
    load_hf_checkpoint,
    load_model,
    save_hf_checkpoint,
)
