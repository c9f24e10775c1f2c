from haconvdr_tpu.utils.io import (  # noqa: F401
    ensure_dirs,
    pload,
    pstore,
    read_jsonl,
    write_jsonl,
    set_seed,
)
