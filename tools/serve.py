"""Minimal runnable serving endpoint — the engine's analog of the
reference's GraphQL server process (EP3: ``run/server.py:17-22``,
``utils/interfaces/graphql_interface.py:17-63``), network-stack-free for
this sandbox: a JSON-lines request/response loop over stdin/stdout.

Each request is one JSON object per line; each response is one JSON
object per line (``{"ok": true, "rows": [...]}`` or
``{"ok": false, "error": ...}``). Operations:

* ``{"op": "search", "text": {...}, "tags": {...}, "exact": {...},
  "offset": 0, "limit": 10, "order_by": [...]}`` — conjunctive
  multi-field search over the LATEST table snapshot with the
  reference's semantics: multi-value ``"v1, v2"`` args require every
  term, pagination defaults ``(0, 10)``, nulls filled with ``'None'``
  at the read boundary, ``;``/``--`` rejected (injection-guard parity);
* ``{"op": "changelog", "from_epoch": N}`` — batch read of the
  outbound change feed (``subscribe_movie_updates`` catch-up);
* ``{"op": "subscribe"}`` — drain whatever the change feed currently
  holds through a Structured Streaming reader (availableNow) — the
  subscription path exercised end-to-end without a long-lived socket;
* ``{"op": "diff", "from_version": N, "to_version": M}`` — state-diff
  change feed between two committed snapshots (before/after images,
  metadata-pruned to touched buckets; defaults: latest vs previous);
* ``{"op": "snapshot_version"}`` / ``{"op": "stop"}``.

Usage:

    PYTHONPATH=/root/repo python tools/serve.py <table_root> < requests.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_kafka_project_spark import serving  # noqa: E402
from etl_kafka_project_spark.minilake.table import LakeTable  # noqa: E402


def _rows(df) -> list[dict]:
    return [json.loads(r) for r in df.toJSON().collect()]


class ServeSession:
    """One serving session over a lake table root. ``handle`` is the
    whole protocol — the REPL below and the tests drive it directly."""

    def __init__(self, spark, table_root: str):
        self.spark = spark
        self.table_root = table_root

    def handle(self, req: dict) -> dict:
        try:
            op = req.get("op")
            if op == "search":
                # point queries (every key column pinned by an exact
                # term) read one bucket's manifest-pruned files instead
                # of the whole snapshot
                df = serving.point_lookup(self.spark, self.table_root, req.get("exact"))
                if df is None:
                    df = serving.latest(self.spark, self.table_root)
                offset = int(req.get("offset", 0))
                order_by = req.get("order_by")
                if offset and not order_by:
                    # stable pagination needs a total order; default to
                    # the table's key columns (header read, no manifests)
                    order_by = list(
                        LakeTable(self.spark, self.table_root)
                        .snapshot_header()
                        .props["key_columns"]
                    )
                out = serving.search(
                    df,
                    text=req.get("text"),
                    tags=req.get("tags"),
                    exact=req.get("exact"),
                    offset=offset,
                    limit=req.get("limit", serving.DEFAULT_LIMIT),
                    order_by=order_by,
                )
                return {"ok": True, "rows": _rows(serving.fill_none(out))}
            if op == "changelog":
                feed = serving.read_changelog(
                    self.spark, self.table_root, from_epoch=req.get("from_epoch")
                )
                return {"ok": True, "rows": _rows(feed)}
            if op == "subscribe":
                stream = serving.stream_changelog(self.spark, self.table_root)
                name = f"serve_sub_{uuid.uuid4().hex[:8]}"
                q = (
                    stream.writeStream.format("memory")
                    .queryName(name)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                rows = _rows(self.spark.sql(f"SELECT * FROM {name}"))
                return {"ok": True, "rows": rows}
            if op == "diff":
                # state-diff CDF between two committed versions
                # (before/after images; see cdc/cdf.py)
                from etl_kafka_project_spark.cdc.cdf import diff_snapshots

                table = LakeTable(self.spark, self.table_root)
                v_to = req.get("to_version", table.current_version())
                v_from = req.get("from_version", max(0, int(v_to) - 1))
                return {
                    "ok": True,
                    "rows": _rows(diff_snapshots(table, int(v_from), int(v_to))),
                }
            if op == "snapshot_version":
                return {
                    "ok": True,
                    "version": LakeTable(self.spark, self.table_root).current_version(),
                }
            if op == "stop":
                return {"ok": True, "stopped": True}
            return {"ok": False, "error": f"unknown op: {op!r}"}
        except serving.QueryValidationError as e:
            return {"ok": False, "error": f"validation: {e}"}
        except Exception as e:  # surface, don't kill the loop
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}


def main() -> None:
    from etl_kafka_project_spark.session import build_session

    if len(sys.argv) != 2:
        print("usage: python tools/serve.py <table_root>", file=sys.stderr)
        sys.exit(2)
    spark = build_session()
    sess = ServeSession(spark, sys.argv[1])
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"ok": False, "error": f"bad json: {e}"}), flush=True)
            continue
        resp = sess.handle(req)
        print(json.dumps(resp), flush=True)
        if resp.get("stopped"):
            break
    spark.stop()


if __name__ == "__main__":
    main()
