"""CLI: tokenize the passage collection (reference gen_tokenized_doc.py).

Usage: python -m haconvdr_tpu.cli.gen_tokenized_doc --config cfg.toml
       [index.raw_collection_path=... index.data_output_path=...]
"""

import logging

from haconvdr_tpu.config import config_from_argv
from haconvdr_tpu.index.build import tokenize_collection
from haconvdr_tpu.utils.io import setup_logging


def main(argv=None):
    setup_logging()
    from haconvdr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    title = False
    rest = []
    for a in argv:
        if a.startswith("title="):  # join title before text (tsv title mode)
            title = a.split("=", 1)[1].lower() in ("1", "true", "yes")
        else:
            rest.append(a)
    cfg = config_from_argv(rest)

    def tokenizer_factory(path=cfg.model.pretrained_encoder_path,
                          model_type=cfg.model.model_type):
        from transformers import BertTokenizer, RobertaTokenizer

        cls = BertTokenizer if model_type.upper().startswith("BERT") else RobertaTokenizer
        return cls.from_pretrained(path, do_lower_case=True)

    tokenizer = None
    if cfg.index.num_tokenize_workers <= 1:
        tokenizer = tokenizer_factory()
    corpus = tokenize_collection(
        cfg.index, tokenizer=tokenizer, tokenizer_factory=tokenizer_factory,
        title=title,
    )
    logging.getLogger(__name__).info("tokenized corpus: %d passages", len(corpus))


if __name__ == "__main__":
    main()
