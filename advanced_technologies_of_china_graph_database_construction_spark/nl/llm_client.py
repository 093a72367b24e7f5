"""Live LLM client adapter behind the three engine seams (Compiler /
Classifier / Corrector) — transport-injected, so every retry, timeout,
and concurrency behavior is testable with a scripted fake and no
network.

Parity targets (reference call sites, public OpenAI-compatible API):
- NL→query compilation: ``temperature=0, max_tokens=500`` — determinism
  for query generation (`neo4j_query_executor.py:305-312`).
- Topic classification: ``temperature=0.0``, JSON response format,
  timeout 120 s, ≤10 concurrent requests, ≤5 attempts with exponential
  backoff 4→60 s, invalid-id → error dict (dead-letter), name repaired
  from the id (`TopicClassfication.py:26-28,142-202`).
- Cluster correction: model re-elects a representative per cluster;
  any API failure keeps the original mapping — "API-fail → keep"
  (`recorrect_mapping.py:70-213`).

The engine ships DETERMINISTIC defaults for all three seams (template
planner, length-hash classifier, max-id corrector) so no test or gate
ever touches a network; these adapters are the production drop-ins a
user wires an endpoint into:

    client = LLMClient(http_transport(base_url, api_key), model="...")
    answer(spark, sf, q, compiler=llm_compiler(client))
    classify_topics(docs, taxonomy_df(spark), llm_classifier(client))
    correct_mapping(mapping, llm_corrector(client))

A ``transport`` is ``Callable[[dict], dict]``: one OpenAI-shaped
chat-completions request payload in, one response dict out, raising
``RetryableTransportError`` (rate limit / timeout / 5xx) or
``FatalTransportError`` (4xx) — the seam where a fake substitutes for
the wire.
"""

from __future__ import annotations

import json
import re
import threading
import time
from collections.abc import Callable

import pandas as pd

from .planner import FALLBACK_TEMPLATE, QueryPlan, extract_terms

Transport = Callable[[dict], dict]


class TransportError(Exception):
    """Base for transport failures."""


class RetryableTransportError(TransportError):
    """Rate limit, timeout, connection reset, 5xx — worth retrying
    (the reference's RETRYABLE_EXCEPTIONS set)."""


class FatalTransportError(TransportError):
    """BadRequest-class failures (context length, malformed prompt) —
    retrying cannot help (`TopicClassfication.py:196-198`)."""


class LLMClient:
    """Thin chat-completions client: retry + backoff + concurrency cap
    around an injected transport.

    Matches the reference's resilience envelope: ``max_retries`` total
    attempts with exponential backoff ``backoff_min·2^k`` capped at
    ``backoff_max`` (tenacity ``wait_exponential(multiplier=1, min=4,
    max=60)``), a ``max_concurrency`` semaphore shared by every caller
    thread (asyncio ``Semaphore(10)`` in the reference), and a per-call
    ``timeout`` forwarded to the transport.  ``sleep`` is injectable so
    tests assert the schedule instead of waiting it out.
    """

    def __init__(
        self,
        transport: Transport,
        model: str,
        timeout: float = 120.0,
        max_retries: int = 5,
        backoff_min: float = 4.0,
        backoff_max: float = 60.0,
        max_concurrency: int = 10,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        if max_retries < 1:
            raise ValueError(f"max_retries must be >= 1, got {max_retries}")
        self._transport = transport
        self.model = model
        self.timeout = timeout
        self.max_retries = max_retries
        self.backoff_min = backoff_min
        self.backoff_max = backoff_max
        self.max_concurrency = max_concurrency
        self._sem = threading.Semaphore(max_concurrency)
        self._sleep = sleep

    # The client rides into executors inside mapInPandas closures
    # (llm_classifier); a Semaphore can't be pickled, and recreating it
    # per process is the intended semantics anyway — the in-flight cap
    # is per worker, mirroring one async loop per process in the
    # reference.
    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        del state["_sem"]
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._sem = threading.Semaphore(self.max_concurrency)

    def chat(
        self,
        messages: list[dict],
        temperature: float = 0.0,
        max_tokens: int | None = None,
        response_format: dict | None = None,
    ) -> str:
        """One chat completion → assistant message content (stripped).
        Raises the last ``RetryableTransportError`` after exhausting
        retries (tenacity ``reraise=True``); ``FatalTransportError``
        propagates immediately."""
        payload: dict = {
            "model": self.model,
            "messages": messages,
            "temperature": temperature,
            "timeout": self.timeout,
        }
        if max_tokens is not None:
            payload["max_tokens"] = max_tokens
        if response_format is not None:
            payload["response_format"] = response_format
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                with self._sem:
                    resp = self._transport(payload)
            except RetryableTransportError as exc:
                last = exc
                if attempt < self.max_retries - 1:
                    self._sleep(min(self.backoff_max, self.backoff_min * (2 ** attempt)))
                continue
            # A 200-shaped response that isn't chat-completion-shaped
            # (gateways commonly return {"error": ...} with HTTP 200, or a
            # null content) must surface through the SAME failure taxonomy
            # the adapters catch — not as a raw KeyError that bypasses the
            # compiler-fallback / dead-letter / keep-mapping contracts.
            try:
                content = resp["choices"][0]["message"]["content"]
                if content is None:
                    raise TypeError("content is null")
                return content.strip()
            except (KeyError, IndexError, TypeError, AttributeError) as exc:
                raise FatalTransportError(
                    f"malformed transport response ({exc}): {str(resp)[:200]}"
                ) from exc
        assert last is not None
        raise last


def http_transport(base_url: str, api_key: str = "") -> Transport:
    """Real-wire transport over stdlib urllib against any
    OpenAI-compatible ``/chat/completions`` endpoint (the reference
    points the OpenAI SDK at DeepSeek's base_url the same way).  HTTP
    status classes map onto the retry taxonomy: 408/429/5xx retryable,
    other 4xx fatal.  Never exercised by tests — the fakes are."""
    import urllib.error
    import urllib.request

    url = base_url.rstrip("/") + "/chat/completions"

    def _send(payload: dict) -> dict:
        body = {k: v for k, v in payload.items() if k != "timeout"}
        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                **({"Authorization": f"Bearer {api_key}"} if api_key else {}),
            },
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=payload.get("timeout")) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code in (408, 429) or e.code >= 500:
                raise RetryableTransportError(f"HTTP {e.code}") from e
            raise FatalTransportError(f"HTTP {e.code}") from e
        except (urllib.error.URLError, TimeoutError, OSError) as e:
            raise RetryableTransportError(str(e)) from e

    return _send


# ----------------------------------------------------------- Q1 compiler ---

_COMPILE_SYSTEM = (
    "You translate a user question about a document graph into ONE JSON "
    'object {"template": str, "params": object, "terms": [str, ...]} '
    "choosing a template from the catalog below. Reply with JSON only.\n\n"
)


def llm_compiler(client: LLMClient) -> Callable[[str, str], QueryPlan]:
    """Compiler seam adapter: catalog-prompted plan generation at
    ``temperature=0, max_tokens=500`` (`neo4j_query_executor.py:305-312`
    — determinism for query generation).  The model emits the QueryPlan
    IR as JSON instead of spliced Cypher text; anything unusable — a
    transport failure, non-JSON output, a missing template — degrades to
    the fallback fulltext plan over the question's quoted terms, the
    reference's error→fallback shape (`:320-322`)."""

    def compile(question: str, catalog_prompt: str) -> QueryPlan:
        terms = extract_terms(question)
        try:
            content = client.chat(
                [
                    {"role": "system", "content": _COMPILE_SYSTEM + catalog_prompt},
                    {"role": "user", "content": question},
                ],
                temperature=0.0,
                max_tokens=500,
            )
            obj = _parse_json_object(content)
            template = obj.get("template")
            if not isinstance(template, str) or not template:
                raise ValueError(f"no template in {obj!r}")
            params = obj.get("params") or {}
            if not isinstance(params, dict):
                raise ValueError(f"params not an object: {params!r}")
            out_terms = [t for t in (obj.get("terms") or []) if isinstance(t, str)]
            return QueryPlan(
                template=template, params=params, terms=out_terms or terms
            )
        except (TransportError, ValueError):
            return QueryPlan(template=FALLBACK_TEMPLATE, params={}, terms=terms)

    return compile


def _parse_json_object(content: str) -> dict:
    """Parse a JSON object out of a model reply, tolerating the usual
    code-fence wrapping; raise ValueError when there is none."""
    m = re.search(r"\{.*\}", content, re.DOTALL)
    if not m:
        raise ValueError(f"no JSON object in model reply: {content[:200]!r}")
    obj = json.loads(m.group(0))
    if not isinstance(obj, dict):
        raise ValueError(f"model reply is not a JSON object: {content[:200]!r}")
    return obj


# --------------------------------------------------------- M7 classifier ---

def llm_classifier(
    client: LLMClient, taxonomy: list[dict] | None = None
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Classifier seam adapter: per-document topic classification in
    JSON mode at ``temperature=0.0`` (`TopicClassfication.py:142-148`).

    Batch shape: one Arrow batch in (doc_id, text), one out (doc_id,
    topic_id, error).  Within the batch, rows fan out across threads and
    the client's shared semaphore enforces the global ≤10 in-flight cap
    (the reference's ``MAX_CONCURRENT_REQUESTS``) — executor-side
    parallelism multiplies by partitions, the semaphore is per-worker,
    matching one async loop per process in the reference.

    Failure taxonomy mirrors `:170-198`: unparseable JSON / missing or
    non-integer topic_id / id outside the taxonomy / exhausted retries /
    BadRequest → NULL topic_id + error string (the dead-letter channel);
    topic_name repair from the id happens downstream in
    ``classify_topics``'s taxonomy join."""
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.enrich import TAXONOMY

    raw = taxonomy if taxonomy is not None else TAXONOMY
    tax = [
        t if isinstance(t, dict) else {
            "topic_id": t[0], "category": t[1],
            "topic_name": t[2], "description": t[3],
        }
        for t in raw
    ]
    valid_ids = {t["topic_id"] for t in tax}
    topics_json = json.dumps(tax, ensure_ascii=False)
    system = (
        "Classify the document into exactly one topic from this taxonomy. "
        'Reply with JSON only: {"topic_id": int, "topic_name": str}.\n'
        f"Taxonomy: {topics_json}"
    )

    def classify_one(doc_id, text) -> tuple:
        try:
            content = client.chat(
                [
                    {"role": "system", "content": system},
                    {"role": "user", "content": str(text)},
                ],
                temperature=0.0,
                response_format={"type": "json_object"},
            )
            obj = _parse_json_object(content)
            tid = obj.get("topic_id")
            if not isinstance(tid, int) or tid not in valid_ids:
                return doc_id, None, f"invalid topic_id from API: {tid!r}"
            return doc_id, tid, None
        except (TransportError, ValueError) as exc:
            return doc_id, None, f"model_error: {exc}"

    def classifier(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            rows = []
        else:
            # pool width = the client's own concurrency knob: more
            # threads would just block on the semaphore, fewer would
            # make the configured cap unreachable
            with ThreadPoolExecutor(max_workers=client.max_concurrency) as pool:
                rows = list(pool.map(classify_one, pdf["doc_id"], pdf["text"]))
        out = pd.DataFrame(rows, columns=["doc_id", "topic_id", "error"])
        out["topic_id"] = out["topic_id"].astype("Int32")
        out["error"] = out["error"].astype("object")
        return out

    return classifier


# ---------------------------------------------------------- M6 corrector ---

def llm_corrector(client: LLMClient) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Corrector seam adapter: the model reviews one cluster's members
    and elects the representative (`recorrect_mapping.py:70-213`).  Any
    failure — transport, non-JSON, an id outside the cluster — KEEPS the
    builder's mapping for that cluster unchanged (the reference's
    API-fail→keep contract), so correction can only refine, never
    corrupt."""

    def correct(pdf: pd.DataFrame) -> pd.DataFrame:
        members = [int(x) for x in pdf["id"].tolist()]
        try:
            content = client.chat(
                [
                    {
                        "role": "system",
                        "content": (
                            "These ids are aliases of one entity. Pick the id that "
                            "should be the canonical representative. Reply with "
                            'JSON only: {"canonical": int}.'
                        ),
                    },
                    {"role": "user", "content": json.dumps(members)},
                ],
                temperature=0.0,
                response_format={"type": "json_object"},
            )
            rep = _parse_json_object(content).get("canonical")
            if not isinstance(rep, int) or rep not in set(members):
                raise ValueError(f"canonical {rep!r} not a cluster member")
            return pd.DataFrame({"id": pdf["id"], "canonical": rep})
        except (TransportError, ValueError):
            return pd.DataFrame({"id": pdf["id"], "canonical": pdf["canonical"]})

    return correct
