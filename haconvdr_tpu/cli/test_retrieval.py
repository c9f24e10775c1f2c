"""CLI: retrieval evaluation (reference src/test_HAConvDR_topiocqa.py /
test_HAConvDR_qrecc.py): encode test queries with a trained checkpoint,
search the embedding store, write TREC run, print metrics.

Usage: python -m haconvdr_tpu.cli.test_retrieval --config cfg.toml
       [data.dataset=topiocqa search.test_type=convqp ...]
"""

import logging

from haconvdr_tpu.config import config_from_argv
from haconvdr_tpu.models.hf_import import load_model
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.retrieval import (
    build_test_examples,
    gen_metric_score_and_save,
    get_test_query_embeddings,
)
from haconvdr_tpu.utils.io import set_seed, setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    setup_logging()
    from haconvdr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = config_from_argv(argv)
    set_seed(cfg.data.seed)
    cfg.data.is_train = False

    tokenizer, encoder = load_model(
        cfg.model.model_type + "_Query", cfg.model.pretrained_encoder_path
    )
    cfg.model = encoder.cfg
    mesh = make_mesh()
    examples = build_test_examples(cfg, tokenizer)
    logger.info("test examples: %d", len(examples))
    embs, ids = get_test_query_embeddings(
        cfg, encoder.params, mesh=mesh, examples=examples
    )
    res = gen_metric_score_and_save(cfg, embs, ids)
    logger.info("Test finish! %s", res)
    return res


if __name__ == "__main__":
    main()
