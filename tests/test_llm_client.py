"""LLM client adapter tests — every wire behavior exercised through
scripted fake transports, zero network.

Covers the reference's resilience envelope (retry/backoff/concurrency,
`TopicClassfication.py:26-28,142-148`), compile-time determinism knobs
(`neo4j_query_executor.py:305-312`), and the API-fail→keep correction
contract (`recorrect_mapping.py`), plus the full serving cascade and
classification dead-letter paths through the adapters.
"""

from __future__ import annotations

import json
import threading
import time

import pandas as pd
import pytest

from advanced_technologies_of_china_graph_database_construction_spark.nl.llm_client import (
    FatalTransportError,
    LLMClient,
    RetryableTransportError,
    llm_classifier,
    llm_compiler,
    llm_corrector,
)
from advanced_technologies_of_china_graph_database_construction_spark.nl.planner import (
    FALLBACK_TEMPLATE,
)

SF = "/root/testdata/sf0.001"


def reply(content: str) -> dict:
    return {"choices": [{"message": {"content": content}}]}


class ScriptedTransport:
    """Fake transport: pops outcomes (dict reply or exception) in order
    and records every request payload."""

    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.payloads = []

    def __call__(self, payload):
        self.payloads.append(payload)
        out = self.outcomes.pop(0)
        if isinstance(out, Exception):
            raise out
        return out


# ------------------------------------------------------------ retry core ---

def test_chat_retries_then_succeeds_with_reference_backoff():
    sleeps = []
    t = ScriptedTransport(
        [RetryableTransportError("429"), RetryableTransportError("timeout"), reply("ok")]
    )
    c = LLMClient(t, model="m", sleep=sleeps.append)
    assert c.chat([{"role": "user", "content": "q"}]) == "ok"
    # wait_exponential(multiplier=1, min=4, max=60): 4, 8, 16, 32, 60, 60…
    assert sleeps == [4.0, 8.0]
    assert len(t.payloads) == 3


def test_chat_reraises_after_max_retries():
    sleeps = []
    t = ScriptedTransport([RetryableTransportError(f"try{i}") for i in range(5)])
    c = LLMClient(t, model="m", sleep=sleeps.append)
    with pytest.raises(RetryableTransportError, match="try4"):
        c.chat([{"role": "user", "content": "q"}])
    assert sleeps == [4.0, 8.0, 16.0, 32.0]  # 5 attempts, 4 backoffs
    assert len(t.payloads) == 5


def test_chat_fatal_error_is_not_retried():
    t = ScriptedTransport([FatalTransportError("400 context length")])
    c = LLMClient(t, model="m", sleep=lambda s: pytest.fail("must not sleep"))
    with pytest.raises(FatalTransportError):
        c.chat([{"role": "user", "content": "q"}])
    assert len(t.payloads) == 1


def test_chat_payload_carries_knobs():
    t = ScriptedTransport([reply("ok")])
    c = LLMClient(t, model="deepseek-chat", timeout=120.0)
    c.chat(
        [{"role": "user", "content": "q"}],
        temperature=0.0,
        max_tokens=500,
        response_format={"type": "json_object"},
    )
    p = t.payloads[0]
    assert p["model"] == "deepseek-chat"
    assert p["temperature"] == 0.0
    assert p["max_tokens"] == 500
    assert p["response_format"] == {"type": "json_object"}
    assert p["timeout"] == 120.0


def test_concurrency_capped_by_semaphore():
    lock = threading.Lock()
    state = {"now": 0, "peak": 0}

    def transport(payload):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        time.sleep(0.02)
        with lock:
            state["now"] -= 1
        return reply("ok")

    c = LLMClient(transport, model="m", max_concurrency=3)
    threads = [
        threading.Thread(target=c.chat, args=([{"role": "user", "content": "q"}],))
        for _ in range(12)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert state["peak"] <= 3


# ------------------------------------------------------------- compiler ----

def test_llm_compiler_emits_plan_and_reference_knobs():
    t = ScriptedTransport(
        [reply('{"template": "authors_of_doc", "params": {"title": "DOC-7"}, "terms": ["DOC-7"]}')]
    )
    compile = llm_compiler(LLMClient(t, model="m"))
    p = compile('Who wrote "DOC-7"?', "CATALOG")
    assert p.template == "authors_of_doc"
    assert p.params == {"title": "DOC-7"}
    assert p.terms == ["DOC-7"]
    # determinism knobs for query generation (reference parity)
    assert t.payloads[0]["temperature"] == 0.0
    assert t.payloads[0]["max_tokens"] == 500
    assert "CATALOG" in t.payloads[0]["messages"][0]["content"]


def test_llm_compiler_degrades_to_fallback_on_garbage_and_transport_failure():
    # non-JSON reply
    c1 = llm_compiler(LLMClient(ScriptedTransport([reply("sorry, no")]), model="m"))
    p1 = c1('Find "merge batch" docs', "CAT")
    assert p1.template == FALLBACK_TEMPLATE and p1.terms == ["merge batch"]
    # transport exhaustion
    c2 = llm_compiler(
        LLMClient(
            ScriptedTransport([RetryableTransportError("503")] * 5),
            model="m",
            sleep=lambda s: None,
        )
    )
    p2 = c2('Find "merge batch" docs', "CAT")
    assert p2.template == FALLBACK_TEMPLATE and p2.terms == ["merge batch"]


def test_answer_cascade_through_llm_compiler(spark):
    """End-to-end: the serving cascade driven by an LLM-backed compiler
    with a scripted reply (template path), then an unknown-template
    reply that must degrade to fulltext fallback."""
    from advanced_technologies_of_china_graph_database_construction_spark.nl.engine import answer

    t = ScriptedTransport(
        [reply('{"template": "doc_properties", "params": {"title": "DOC-7"}, "terms": ["DOC-7"]}')]
    )
    out = answer(
        spark, SF, 'What is the year and abstract of "DOC-7"?',
        compiler=llm_compiler(LLMClient(t, model="m")),
    )
    assert out["template"] == "doc_properties"
    assert out["stage"] == "template" and out["n_rows"] == 1
    assert "DOC-7" in out["answer"]
    # the catalog prompt reached the model
    assert "Rules:" in t.payloads[0]["messages"][0]["content"]

    t2 = ScriptedTransport(
        [reply('{"template": "no_such_template", "params": {}, "terms": ["merge batch"]}')]
    )
    out2 = answer(
        spark, SF, 'Find documents mentioning "merge batch"',
        compiler=llm_compiler(LLMClient(t2, model="m")),
    )
    assert out2["template"] == FALLBACK_TEMPLATE
    assert out2["n_rows"] > 0  # fallback search over the emitted terms hit


# ------------------------------------------------------------ classifier ---

def test_llm_classifier_valid_invalid_and_failed_rows(spark):
    """t01-shaped run through the adapter: valid ids classify, invalid
    ids and exhausted retries land in the dead-letter channel with the
    name repaired from the id for valid rows."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.enrich import (
        classify_topics,
        split_dead_letter,
        taxonomy_df,
    )

    docs = spark.createDataFrame(
        [(1, "about cpus"), (2, "about nets"), (3, "junk")], "doc_id long, text string"
    )

    outcomes = {
        "about cpus": reply('{"topic_id": 1, "topic_name": "processors"}'),
        "about nets": reply('{"topic_id": 99, "topic_name": "nope"}'),  # invalid id
        "junk": RetryableTransportError("503"),  # will exhaust retries
    }

    def transport(payload):
        out = outcomes[payload["messages"][1]["content"]]
        if isinstance(out, Exception):
            raise out
        return out

    client = LLMClient(transport, model="m", max_retries=2, sleep=lambda s: None)
    classified = classify_topics(docs, taxonomy_df(spark), llm_classifier(client))
    ok, dead = split_dead_letter(classified)
    ok_rows = {r.doc_id: (r.topic_id, r.topic_name) for r in ok.collect()}
    dead_rows = {r.doc_id: r.error for r in dead.collect()}
    assert ok_rows == {1: (1, "processors")}
    assert "invalid topic_id" in dead_rows[2]
    assert dead_rows[3].startswith("model_error")


def test_llm_classifier_json_mode_and_temperature():
    t = ScriptedTransport([reply('{"topic_id": 1, "topic_name": "processors"}')])
    cls = llm_classifier(LLMClient(t, model="m"))
    out = cls(pd.DataFrame({"doc_id": [7], "text": ["x"]}))
    assert list(out.columns) == ["doc_id", "topic_id", "error"]
    assert out["topic_id"].tolist() == [1]
    assert t.payloads[0]["temperature"] == 0.0
    assert t.payloads[0]["response_format"] == {"type": "json_object"}


# ------------------------------------------------------------- corrector ---

def test_llm_corrector_reelects_and_keeps_on_failure(spark):
    """t04-shaped run: the model re-elects a member as representative;
    clusters whose call fails keep the builder's mapping (API-fail→keep)."""
    from advanced_technologies_of_china_graph_database_construction_spark.operators.enrich import (
        correct_mapping,
    )

    mapping = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (42, 42)],
        "id long, canonical long",
    )

    def transport(payload):
        members = json.loads(payload["messages"][1]["content"])
        if 10 in members:
            raise RetryableTransportError("503")  # this cluster's call fails
        return reply(json.dumps({"canonical": max(members)}))

    client = LLMClient(transport, model="m", max_retries=1, sleep=lambda s: None)
    out = {
        r.id: r.canonical
        for r in correct_mapping(mapping, llm_corrector(client)).collect()
    }
    # cluster {1,2,3}: model elected 3; cluster {10,11}: failed -> kept;
    # singleton 42 never hits the model (min_cluster_size=2)
    assert out == {1: 3, 2: 3, 3: 3, 10: 10, 11: 10, 42: 42}


def test_llm_corrector_rejects_non_member_election():
    corr = llm_corrector(
        LLMClient(ScriptedTransport([reply('{"canonical": 999}')]), model="m")
    )
    pdf = pd.DataFrame({"id": [1, 2], "canonical": [1, 1]})
    out = corr(pdf)
    assert out["canonical"].tolist() == [1, 1]  # kept, not corrupted


def test_malformed_200_response_follows_failure_taxonomy():
    """A transport returning HTTP-200-shaped garbage ({'error': ...},
    null content) must raise through the taxonomy the adapters catch —
    the compiler degrades to fallback instead of propagating KeyError."""
    for garbage in (
        {"error": {"message": "quota exceeded"}},
        {"choices": []},
        {"choices": [{"message": {"content": None}}]},
    ):
        c = LLMClient(ScriptedTransport([garbage]), model="m")
        with pytest.raises(FatalTransportError, match="malformed"):
            c.chat([{"role": "user", "content": "q"}])
    compile = llm_compiler(
        LLMClient(ScriptedTransport([{"error": "nope"}]), model="m")
    )
    p = compile('Find "merge batch" docs', "CAT")
    assert p.template == FALLBACK_TEMPLATE and p.terms == ["merge batch"]


def test_max_retries_validated():
    with pytest.raises(ValueError, match="max_retries"):
        LLMClient(ScriptedTransport([]), model="m", max_retries=0)


def test_classifier_pool_respects_client_concurrency():
    lock = threading.Lock()
    state = {"now": 0, "peak": 0}

    def transport(payload):
        with lock:
            state["now"] += 1
            state["peak"] = max(state["peak"], state["now"])
        time.sleep(0.02)
        with lock:
            state["now"] -= 1
        return reply('{"topic_id": 1, "topic_name": "processors"}')

    cls = llm_classifier(LLMClient(transport, model="m", max_concurrency=2))
    out = cls(pd.DataFrame({"doc_id": range(12), "text": ["x"] * 12}))
    assert len(out) == 12 and state["peak"] <= 2


# ------------------------------------------------------- http transport ----

def test_http_transport_against_loopback_server():
    """The real-wire path over a loopback stdlib server: payload shape
    on the wire, 429/5xx → RetryableTransportError (and retried by the
    client), 400 → FatalTransportError."""
    import threading as th
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from advanced_technologies_of_china_graph_database_construction_spark.nl.llm_client import (
        http_transport,
    )

    received = []
    script = [429, 500, 200]  # then 400 on the 4th call

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            assert self.path == "/v1/chat/completions"
            assert self.headers["Authorization"] == "Bearer sk-test"
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            received.append(body)
            code = script.pop(0) if script else 400
            if code != 200:
                self.send_error(code)
                return
            out = json.dumps(reply("pong")).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    th.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        transport = http_transport(f"http://127.0.0.1:{port}/v1", api_key="sk-test")
        client = LLMClient(transport, model="deepseek-chat", sleep=lambda s: None)
        # 429 then 500 are retried; third attempt succeeds
        out = client.chat(
            [{"role": "user", "content": "ping"}], temperature=0.0, max_tokens=500
        )
        assert out == "pong"
        assert len(received) == 3
        # wire payload carries the knobs but NOT the local-only timeout key
        assert received[0]["model"] == "deepseek-chat"
        assert received[0]["max_tokens"] == 500
        assert "timeout" not in received[0]
        # a 400 is fatal: no retry, immediate raise
        with pytest.raises(FatalTransportError, match="400"):
            client.chat([{"role": "user", "content": "bad"}])
        assert len(received) == 4
    finally:
        server.shutdown()


def test_http_transport_connection_refused_is_retryable():
    """Connection-level failures (server down, DNS, reset) map to
    RetryableTransportError — the degradation contract the adapters
    build on (r11/r12 verdict carry: the live-adapter seam must
    degrade, not crash, on a dead endpoint)."""
    import socket

    from advanced_technologies_of_china_graph_database_construction_spark.nl.llm_client import (
        RetryableTransportError,
        http_transport,
    )

    # grab a port and close it so nothing listens there
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    transport = http_transport(f"http://127.0.0.1:{port}/v1")
    with pytest.raises(RetryableTransportError):
        transport({"model": "m", "messages": [], "timeout": 0.5})
    # and the full adapter stack degrades instead of propagating
    client = LLMClient(transport, model="m", max_retries=2, sleep=lambda s: None)
    plan = llm_compiler(client)('Find "x" docs', "CAT")
    assert plan.template == FALLBACK_TEMPLATE
