"""CLI: build the pod-scale IVF serving index offline and persist it.

Usage:
  python -m haconvdr_tpu.cli.build_ivf embeddings=<block store dir> \
      out=<ivf artifact dir> [nlist=4096 nprobe=64 slack=1.3 \
      dtype=bfloat16|int8|float32 train_rows=262144 kmeans_iters=10 \
      seed=0 num_blocks=-1 chunk_rows=65536 by_residual=1]

The offline analog of the reference's embedding-block generation step
(gen_doc_embeddings.py artifacts), applied to the pruned index: the
multi-pass streaming build (parallel/sharded_ivf.build_ivf_from_store)
runs once here, the per-shard slabs land in ``out``
(save_ivf_sharded), and every serving restart loads them in seconds —
``Retriever(ivf=True, ivf_dir=out)`` or ``load_ivf_sharded`` directly,
onto the SAME or a RESHAPED pod (the new shard count must divide
nlist).  Prints one JSON line with the build stats.
"""

import json
import logging
import sys
import time

logger = logging.getLogger(__name__)


def main(argv=None):
    from haconvdr_tpu.utils.io import parse_kv_args, setup_logging

    setup_logging()
    from haconvdr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_kv_args(list(sys.argv[1:] if argv is None else argv))
    if "embeddings" not in args or "out" not in args:
        raise SystemExit(__doc__)

    from haconvdr_tpu.index.store import EmbeddingBlockStore
    from haconvdr_tpu.parallel.mesh import make_mesh
    from haconvdr_tpu.parallel.sharded_ivf import (
        build_ivf_from_store,
        save_ivf_sharded,
    )

    store = EmbeddingBlockStore.open_auto(args["embeddings"])
    mesh = make_mesh()
    t0 = time.time()
    index = build_ivf_from_store(
        mesh,
        store,
        nlist=int(args.get("nlist", "4096")),
        nprobe=int(args.get("nprobe", "64")),
        slack=float(args.get("slack", "1.3")),
        train_rows=int(args.get("train_rows", "262144")),
        kmeans_iters=int(args.get("kmeans_iters", "10")),
        dtype=args.get("dtype", "bfloat16"),
        seed=int(args.get("seed", "0")),
        num_blocks=int(args.get("num_blocks", "-1")),
        chunk_rows=int(args.get("chunk_rows", "65536")),
        by_residual=args.get("by_residual", "1") not in ("0", "false", "False"),
    )
    build_s = time.time() - t0
    t0 = time.time()
    save_ivf_sharded(index, args["out"])
    stats = {
        "out": args["out"],
        "nlist": int(index.buckets.shape[0]),
        "capacity": int(index.buckets.shape[1]),
        "dim": int(index.buckets.shape[2]),
        "tail_rows": int(index.tail.shape[0]),
        "dtype": str(index.buckets.dtype),
        "n_shards": int(mesh.devices.size),
        "build_s": round(build_s, 2),
        "save_s": round(time.time() - t0, 2),
    }
    logger.info("%s", stats)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
