from haconvdr_tpu.index.store import (  # noqa: F401
    TokenizedCorpusWriter,
    TokenizedCorpus,
    EmbeddingBlockStore,
    ReferenceEmbeddingCacheReader,
)
from haconvdr_tpu.index.build import tokenize_collection, encode_corpus  # noqa: F401
