"""CLI: PRJ labeling pass (reference src/test_PRJ_topiocqa.py /
test_PRJ_qrecc.py): dense-retrieve probe queries, MRR-diff judge, write
rel-label JSONL.

Usage: python -m haconvdr_tpu.cli.test_prj --config cfg.toml
       data.test_file_path=<probe_file> search.trec_gold_qrel_file_path=<probe qrels>
       [prj_output=<rel label output>] [ori_qrel_file=<qrecc qrel filter>]
"""

import logging
import sys

from haconvdr_tpu.config import config_from_argv
from haconvdr_tpu.models.hf_import import load_model
from haconvdr_tpu.retrieval import run_prj_labeling, write_rel_labels
from haconvdr_tpu.utils.io import read_jsonl_list, set_seed, setup_logging

logger = logging.getLogger(__name__)


def main(argv=None):
    setup_logging()
    from haconvdr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = {}
    rest = []
    extra_keys = ("prj_output", "ori_qrel_file", "cross_validate", "num_folds", "test_epoch")
    for a in argv:
        if any(a.startswith(p + "=") for p in extra_keys):
            k, _, v = a.partition("=")
            extra[k] = v
        else:
            rest.append(a)
    cfg = config_from_argv(rest)
    set_seed(cfg.data.seed)

    qrel_ids = None
    if "ori_qrel_file" in extra:
        qrel_ids = set()
        for rec in read_jsonl_list(extra["ori_qrel_file"]):
            sid = rec["sample_id"]
            conv, turn = sid.split("_")[-2:]
            qrel_ids.add(f"{conv}-{turn}")

    if extra.get("cross_validate", "").lower() in ("1", "true", "yes"):
        # 5-fold cross-validated PRJ: per-fold probe file '.{i}' + per-fold
        # model 'fold_{i}/epoch-{E}', embeddings concatenated before one
        # search pass (src/test_PRJ_topiocqa.py:501-523)
        import numpy as np

        from haconvdr_tpu.data.prj import build_prj_probe_examples
        from haconvdr_tpu.retrieval import get_test_query_embeddings

        num_folds = int(extra.get("num_folds", 5))
        epoch = extra.get("test_epoch", "0")
        base_file = cfg.data.test_file_path
        base_model = cfg.model.pretrained_encoder_path
        probe_records, all_embs, all_ids = [], [], []
        tokenizer = None
        for fold in range(num_folds):
            fold_model = f"{base_model}/fold_{fold}/epoch-{epoch}"
            tokenizer, encoder = load_model(
                cfg.model.model_type + "_Query", fold_model
            )
            cfg.model = encoder.cfg
            fold_file = f"{base_file}.{fold}"
            probe_records.extend(read_jsonl_list(fold_file))
            examples = build_prj_probe_examples(cfg.data, tokenizer, fold_file)
            embs, ids = get_test_query_embeddings(
                cfg, encoder.params, examples=examples, query_key="pair_query"
            )
            all_embs.append(embs)
            all_ids.extend(ids)
        rel = run_prj_labeling(
            cfg, None, probe_records, cfg.search.trec_gold_qrel_file_path,
            tokenizer, qrel_ids=qrel_ids,
            query_embs=np.concatenate(all_embs, axis=0), query_ids=all_ids,
        )
        out = extra.get("prj_output", "rel_label.json")
        write_rel_labels(rel, out)
        logger.info("rel labels written to %s", out)
        return

    tokenizer, encoder = load_model(
        cfg.model.model_type + "_Query", cfg.model.pretrained_encoder_path
    )
    cfg.model = encoder.cfg

    probe_records = read_jsonl_list(cfg.data.test_file_path)
    rel = run_prj_labeling(
        cfg, encoder.params, probe_records,
        cfg.search.trec_gold_qrel_file_path, tokenizer, qrel_ids=qrel_ids,
    )
    out = extra.get("prj_output", "rel_label.json")
    write_rel_labels(rel, out)
    logger.info("rel labels written to %s", out)


if __name__ == "__main__":
    main()
