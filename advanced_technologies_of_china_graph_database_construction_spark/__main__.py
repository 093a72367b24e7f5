"""Command-line face of the engine — the operational surface a user of
the reference's scripts would reach for:

    python -m advanced_technologies_of_china_graph_database_construction_spark query 'Who wrote "DOC-7"?'
    python -m advanced_technologies_of_china_graph_database_construction_spark serve --port 8080 --history-db chats.db
    python -m advanced_technologies_of_china_graph_database_construction_spark export-csv --out /tmp/neo4j_csv_import

``query`` runs one question through the full serving cascade and prints
the synthesized answer; ``serve`` starts the HTTP ``POST /answer``
endpoint (S12) with optional SQLite chat history (S11); ``export-csv``
writes the full neo4j-admin import bundle (node + relationship CSVs, the
reference pipeline's primary artifact — `csv_extractor.py` end-to-end)
from the derived graph.
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
    x = sub.add_parser("export-csv", help="write the neo4j-admin import CSV bundle")
    x.add_argument("--out", required=True, help="output directory for the bundle")
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
    if args.cmd == "export-csv":
        from .operators.graph import build_graph
        from .sources.csv_export import write_node_csvs, write_relationship_csvs

        g = build_graph(spark, args.sf_dir)
        paths = write_node_csvs(g, args.out)
        paths.update(write_relationship_csvs(g, args.out))
        for name, path in sorted(paths.items()):
            print(f"{name}: {path}")
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
