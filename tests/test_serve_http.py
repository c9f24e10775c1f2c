"""RetrievalServer: the HTTP/JSON serving daemon (serve_http.py).

Contract: HTTP results equal the in-process sequential Retriever.retrieve
path, concurrent HTTP clients coalesce through the batcher into fewer
device dispatches, malformed input gets 4xx (never a hang or a 500),
/stats and /healthz report truthfully, and close() drains in-flight work.
The reference has no serving layer at all (retrieval exists only as batch
eval scripts, src/test_HAConvDR_topiocqa.py) — beyond-reference surface,
tested over real sockets on the virtual CPU mesh.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from haconvdr_tpu.config import DataConfig, IndexConfig, ModelConfig, SearchConfig
from haconvdr_tpu.index.build import encode_corpus, tokenize_collection
from haconvdr_tpu.index.store import EmbeddingBlockStore
from haconvdr_tpu.models.encoder import init_encoder_params
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.parallel.sharded_encode import make_sharded_encode_fn, shard_params
from haconvdr_tpu.serve import Retriever
from haconvdr_tpu.serve_http import RetrievalServer
from haconvdr_tpu.utils.testing import FakeTokenizer

N_PASSAGES = 40
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def _passage_text(pid):
    return " ".join(WORDS[(pid + j) % len(WORDS)] for j in range(4)) + f" tok{pid}"


@pytest.fixture(scope="module")
def retriever(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_http")
    coll = tmp / "collection.tsv"
    with open(coll, "w") as f:
        f.write("id\ttext\ttitle\n")
        for pid in range(1, N_PASSAGES + 1):
            f.write(f"{pid}\t{_passage_text(pid)}\ttitle {pid}\n")

    tok = FakeTokenizer()
    mcfg = ModelConfig.tiny(vocab_size=512)
    icfg = IndexConfig(
        raw_collection_path=str(coll),
        data_output_path=str(tmp / "tokenized"),
        max_seq_length=16,
        num_tokenize_workers=1,
    )
    corpus = tokenize_collection(icfg, tokenizer=tok)
    mesh = make_mesh()
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    fn = make_sharded_encode_fn(mesh, mcfg)
    encode_corpus(
        corpus, fn, shard_params(mesh, params),
        str(tmp / "embeds"), batch_size=16, per_block_passage_num=24,
    )
    store = EmbeddingBlockStore(str(tmp / "embeds"))
    return Retriever(
        tok, params, mcfg, store,
        offset2pid=corpus.offset2pid(),
        data_cfg=DataConfig(
            is_train=False, use_PRL=False,
            max_query_length=16, max_doc_length=16, max_concat_length=24,
        ),
        search_cfg=SearchConfig(
            top_k=5, per_device_test_batch_size=1,
            passage_chunk=8, query_chunk=4,
        ),
        resident=True,
    )


@pytest.fixture()
def server(retriever):
    srv = RetrievalServer(
        retriever, port=0, max_batch=8, max_wait_ms=200.0
    ).start()
    yield srv
    srv.close()


def _post(srv, path, obj, timeout=60):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(srv, path, timeout=30):
    with urllib.request.urlopen(
        f"http://{srv.host}:{srv.port}{path}", timeout=timeout
    ) as r:
        return r.status, json.loads(r.read())


def test_retrieve_matches_sequential(server, retriever):
    gold = 11
    seq = retriever.retrieve(_passage_text(gold))
    code, obj = _post(server, "/retrieve", {"question": _passage_text(gold)})
    assert code == 200
    hits = [(h["pid"], h["score"]) for h in obj["hits"]]
    assert hits[0][0] == gold and seq[0][0] == gold
    np.testing.assert_allclose(
        [s for _, s in hits], [s for _, s in seq], rtol=1e-4, atol=1e-5
    )
    assert obj["latency_ms"] > 0


def test_history_and_k_forwarded(server, retriever):
    """history/history_passages/k reach build_query exactly as the
    in-process API would pass them."""
    q = {
        "question": _passage_text(7),
        "history": [[_passage_text(3), "an answer"]],
        "history_passages": [_passage_text(5)],
        "k": 2,
    }
    code, obj = _post(server, "/retrieve", q)
    assert code == 200
    assert len(obj["hits"]) == 2
    seq = retriever.retrieve(
        q["question"], [tuple(q["history"][0])], q["history_passages"], k=2
    )
    assert [h["pid"] for h in obj["hits"]] == [p for p, _ in seq]


def test_concurrent_clients_coalesce(server, retriever):
    """N parallel HTTP clients form fewer device dispatches than queries —
    the server's whole point."""
    golds = [3, 17, 25, 31, 8, 12]
    before = server.batcher.stats()["dispatches"]
    out = {}

    def ask(pid):
        out[pid] = _post(server, "/retrieve", {"question": _passage_text(pid)})

    threads = [threading.Thread(target=ask, args=(p,)) for p in golds]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for pid in golds:
        code, obj = out[pid]
        assert code == 200
        assert obj["hits"][0]["pid"] == pid
    st = server.batcher.stats()
    assert st["dispatches"] - before < len(golds)


def test_retrieve_batch_one_client(server):
    """A single client's /retrieve_batch coalesces like concurrent clients
    and keeps per-query validity (a bad query errors alone)."""
    golds = [5, 9, 14]
    queries = [{"question": _passage_text(p)} for p in golds]
    queries.insert(1, {"question": ""})  # invalid: must not fail the rest
    code, obj = _post(server, "/retrieve_batch", {"queries": queries})
    assert code == 200
    res = obj["results"]
    assert "error" in res[1]
    for pid, r in zip(golds, [res[0]] + res[2:]):
        assert r["hits"][0]["pid"] == pid


def test_bad_input_is_4xx(server):
    for path, body, want in [
        ("/retrieve", {"question": 3}, 400),
        ("/retrieve", {"question": "x", "history": [["only-q"]]}, 400),
        ("/retrieve", {"question": "x", "k": 0}, 400),
        ("/retrieve_batch", {"queries": []}, 400),
        ("/nope", {"question": "x"}, 404),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, path, body)
        assert ei.value.code == want
        assert "error" in json.loads(ei.value.read())
    # malformed JSON body
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/retrieve",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_health_and_stats(server):
    code, h = _get(server, "/healthz")
    assert code == 200 and h["ok"] is True and h["uptime_s"] >= 0
    _post(server, "/retrieve", {"question": _passage_text(21)})
    code, st = _get(server, "/stats")
    assert code == 200
    assert st["served"] >= 1
    assert st["latency_ms"]["p50"] > 0
    assert st["latency_ms"]["p99"] >= st["latency_ms"]["p50"]
    assert "dispatches" in st and "batch_histogram" in st


class _BlockingSearchRetriever:
    """Delegate everything to a real Retriever but gate search() on an
    event — simulates a stalled device dispatch (the failure mode the
    backpressure contract exists for)."""

    def __init__(self, inner):
        self._inner = inner
        self.entered = threading.Event()
        self.release = threading.Event()

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def search(self, embs):
        self.entered.set()
        assert self.release.wait(timeout=120), "test forgot to release"
        return self._inner.search(embs)


def test_backlog_full_is_503_with_retry_after(retriever):
    """With the dispatch worker stalled and the bounded queue full,
    further submits shed load: 503 + Retry-After, served instantly (not
    queued behind the stall).  Queued requests still complete once the
    stall clears."""
    proxy = _BlockingSearchRetriever(retriever)
    srv = RetrievalServer(
        proxy, port=0, max_batch=1, max_wait_ms=0.0,
        queue_depth=2, request_timeout_s=120.0,
    ).start()
    try:
        results = {}

        def ask(i, pid):
            results[i] = _post(
                srv, "/retrieve", {"question": _passage_text(pid)},
                timeout=120,
            )

        t0 = threading.Thread(target=ask, args=(0, 3))
        t0.start()
        assert proxy.entered.wait(timeout=60)  # r0 stalled inside dispatch
        ts = [
            threading.Thread(target=ask, args=(i, 3 + i)) for i in (1, 2)
        ]
        for t in ts:
            t.start()
        deadline = time.time() + 30
        while (
            srv.batcher.stats()["backlog"] < 2 and time.time() < deadline
        ):
            time.sleep(0.01)
        assert srv.batcher.stats()["backlog"] == 2  # queue at queue_depth

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/retrieve", {"question": _passage_text(9)})
        assert ei.value.code == 503
        assert float(ei.value.headers["Retry-After"]) > 0
        assert "backlog" in json.loads(ei.value.read())["error"]

        proxy.release.set()  # stall clears; queued requests drain
        for t in [t0] + ts:
            t.join(timeout=120)
            assert not t.is_alive()
        for i, pid in [(0, 3), (1, 4), (2, 5)]:
            code, obj = results[i]
            assert code == 200 and obj["hits"][0]["pid"] == pid
    finally:
        proxy.release.set()
        srv.close()


def test_stalled_dispatch_times_out_504(retriever):
    """A request whose dispatch stalls past request_timeout_s gets 504
    (request threads are never pinned indefinitely); the late-completing
    dispatch is skipped via the cancelled future, and the server keeps
    serving afterwards."""
    proxy = _BlockingSearchRetriever(retriever)
    srv = RetrievalServer(
        proxy, port=0, max_batch=4, request_timeout_s=0.3
    ).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, "/retrieve", {"question": _passage_text(5)},
                  timeout=60)
        assert ei.value.code == 504
        assert "timed out" in json.loads(ei.value.read())["error"]
        _, st = _get(srv, "/stats")
        assert st["errors"] >= 1

        proxy.release.set()  # the stalled dispatch completes harmlessly
        code, obj = _post(
            srv, "/retrieve", {"question": _passage_text(7)}, timeout=60
        )
        assert code == 200 and obj["hits"][0]["pid"] == 7
    finally:
        proxy.release.set()
        srv.close()


def test_graceful_drain_under_concurrent_load(retriever):
    """close() racing 16 concurrent clients: every client gets a
    definitive outcome (200 with correct hits, 503, or a connection
    error for arrivals after the listener stopped) — nothing hangs."""
    srv = RetrievalServer(
        retriever, port=0, max_batch=4, max_wait_ms=20.0
    ).start()
    outcomes = []
    lock = threading.Lock()

    def ask(pid):
        try:
            code, obj = _post(
                srv, "/retrieve", {"question": _passage_text(pid)},
                timeout=120,
            )
            o = ("ok", pid, obj)
        except urllib.error.HTTPError as e:
            o = ("http", pid, e.code)
        except (urllib.error.URLError, ConnectionError, OSError):
            o = ("conn", pid, None)
        with lock:
            outcomes.append(o)

    threads = [
        threading.Thread(target=ask, args=(1 + i % 20,)) for i in range(16)
    ]
    for t in threads:
        t.start()
    srv.close()  # concurrent with in-flight requests
    for t in threads:
        t.join(timeout=180)
    assert not any(t.is_alive() for t in threads), (
        "a request hung through close()"
    )
    assert len(outcomes) == 16
    for kind, pid, obj in outcomes:
        if kind == "ok":  # accepted before close: full correct answer
            assert obj["hits"][0]["pid"] == pid
        elif kind == "http":  # rejected cleanly
            assert obj in (503, 504)


def test_close_is_idempotent_and_refuses_after(retriever):
    srv = RetrievalServer(retriever, port=0, max_batch=4).start()
    code, obj = _post(srv, "/retrieve", {"question": _passage_text(6)})
    assert code == 200
    srv.close()
    srv.close()  # idempotent
    with pytest.raises((urllib.error.URLError, ConnectionError, OSError)):
        _post(srv, "/retrieve", {"question": _passage_text(6)}, timeout=5)
