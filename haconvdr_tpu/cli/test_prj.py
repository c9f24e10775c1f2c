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
    argv = list(sys.argv[1:] if argv is None else argv)
    extra = {}
    rest = []
    for a in argv:
        if a.startswith("prj_output=") or a.startswith("ori_qrel_file="):
            k, _, v = a.partition("=")
            extra[k] = v
        else:
            rest.append(a)
    cfg = config_from_argv(rest)
    set_seed(cfg.data.seed)

    tokenizer, encoder = load_model(
        cfg.model.model_type + "_Query", cfg.model.pretrained_encoder_path
    )
    cfg.model = encoder.cfg

    probe_records = read_jsonl_list(cfg.data.test_file_path)
    qrel_ids = None
    if "ori_qrel_file" in extra:
        qrel_ids = set()
        for rec in read_jsonl_list(extra["ori_qrel_file"]):
            sid = rec["sample_id"]
            conv, turn = sid.split("_")[-2:]
            qrel_ids.add(f"{conv}-{turn}")
    rel = run_prj_labeling(
        cfg, encoder.params, probe_records,
        cfg.search.trec_gold_qrel_file_path, tokenizer, qrel_ids=qrel_ids,
    )
    out = extra.get("prj_output", "rel_label.json")
    write_rel_labels(rel, out)
    logger.info("rel labels written to %s", out)


if __name__ == "__main__":
    main()
