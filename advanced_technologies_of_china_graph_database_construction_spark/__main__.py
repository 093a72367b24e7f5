"""Command-line face of the engine — the operational surface a user of
the reference's scripts would reach for:

    python -m advanced_technologies_of_china_graph_database_construction_spark query 'Who wrote "DOC-7"?'
    python -m advanced_technologies_of_china_graph_database_construction_spark serve --port 8080 --history-db chats.db

``query`` runs one question through the full serving cascade and prints
the synthesized answer; ``serve`` starts the HTTP ``POST /answer``
endpoint (S12) with optional SQLite chat history (S11).
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog=__package__)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR, help="parquet table directory")
    sub = ap.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("query", help="answer one NL question and exit")
    q.add_argument("question")
    s = sub.add_parser("serve", help="run the HTTP /answer endpoint")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--history-db", default=None, help="SQLite chat-history path")
    args = ap.parse_args(argv)

    from . import get_spark
    from .nl.engine import answer

    spark = get_spark("atcgdc-cli")
    if args.cmd == "query":
        res = answer(spark, args.sf_dir, args.question)
        print(res["answer"])
        print(
            f"[stage={res['stage']} template={res['template']} n_rows={res['n_rows']}]",
            file=sys.stderr,
        )
        return 0
    # serve
    from .nl import api
    from .nl.history import ChatHistory

    history = ChatHistory(args.history_db) if args.history_db else None
    server = api.serve(spark, args.sf_dir, port=args.port, history=history)
    print(f"listening on http://127.0.0.1:{server.server_address[1]}/answer", file=sys.stderr)
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
