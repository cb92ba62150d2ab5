"""ice-compatible CLI.

Verb set mirrors the reference CLI
(/root/reference/ice/src/main/java/com/altinity/ice/cli/Main.java:79-86):
check, create-namespace, delete-namespace, list-namespaces,
create-table, alter-table, delete-table, list-tables, insert, scan,
describe, files, list-partitions, list-snapshots, describe-parquet,
describe-metadata, delete, catalog-export, catalog-import,
perform-maintenance, watch.

Usage:  python -m ice_spark.cli --warehouse /path/wh <verb> [...]
Output is JSON (the reference prints YAML/JSON; JSON only here).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _run_rest(args) -> dict | list:
    """Run a catalog verb against a REST endpoint (--uri). The subset
    here is the metadata plane the reference CLI drives through
    RESTCatalog; data-plane verbs (insert/scan) stay local."""
    from ice_spark.catalog.s3tables import S3TablesClient
    from ice_spark.rest import RestCatalogClient

    if args.uri:
        c = RestCatalogClient(args.uri, token=args.token)
    else:
        # arn:aws:s3tables: warehouse → SigV4-signed managed endpoint
        # (reference Config.java:291-298 dispatch)
        c = S3TablesClient(args.warehouse)
    if args.cmd == "check":
        return {"ok": c.check(), "uri": args.uri or c.uri}
    if args.cmd == "create-namespace":
        c.create_namespace(args.namespace)
        return {"created": args.namespace}
    if args.cmd == "delete-namespace":
        c.delete_namespace(args.namespace)
        return {"deleted": args.namespace}
    if args.cmd == "list-namespaces":
        return c.list_namespaces(args.parent)
    if args.cmd == "list-tables":
        return c.list_tables(args.namespace)
    if args.cmd == "delete-table":
        c.drop_table(args.table, purge=args.purge)
        return {"deleted": args.table, "purged": args.purge}
    if args.cmd == "describe":
        res = c.load_table(args.target)
        return {"metadata_location": res["metadata-location"], "metadata": res["metadata"]}
    if args.cmd == "list-views":
        return c.list_views(args.namespace)
    if args.cmd == "create-view":
        return c.create_view(args.view, args.query, comment=args.comment or "")
    if args.cmd == "drop-view":
        c.drop_view(args.view)
        return {"dropped": args.view}
    raise SystemExit(f"verb {args.cmd!r} is not available over --uri (local data plane only)")


def _json_arg(s: str):
    return json.loads(s)


def _s3_client_if(enabled: bool):
    if not enabled:
        return None
    from ice_spark.sources.s3 import new_s3_client

    return new_s3_client()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ice-spark")
    p.add_argument("--warehouse", required=True, help="warehouse directory")
    p.add_argument(
        "--registry-db",
        help="SQLite registry database path: catalog rows live in this "
        "DB while table trees stay under --warehouse (the reference's "
        "jdbc:sqlite catalog backend, Config.java:262-298). Default: "
        "filesystem-marker registry.",
    )
    p.add_argument(
        "--registry-etcd",
        help="etcd endpoints (host:port[,host:port...]): catalog rows "
        "live in etcd while table trees stay under --warehouse, with "
        "the etcd version-CAS transaction as the commit linearization "
        "point (the reference's production backend, "
        "EtcdCatalog.java:588-640). Requires the 'etcd3' package.",
    )
    p.add_argument(
        "--uri",
        help="REST catalog endpoint (http://host:port); catalog verbs "
        "run as REST calls instead of against the local warehouse "
        "(the reference CLI's RESTCatalog mode, Main.java:1054-1104)",
    )
    p.add_argument("--token", help="bearer token for --uri")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("check")

    sp = sub.add_parser(
        "serve",
        help="serve this warehouse over the Iceberg REST protocol "
        "(ice-rest-catalog analog; SURVEY §2.6)",
    )
    sp.add_argument("--port", type=int, default=8181)
    sp.add_argument(
        "--serve-token",
        action="append",
        default=[],
        metavar="TOKEN[:ro]",
        help="accept this bearer token; ':ro' suffix makes it read-only",
    )
    sp.add_argument("--anonymous", action="store_true", help="allow unauthenticated access")

    sp = sub.add_parser("create-namespace")
    sp.add_argument("namespace")
    sp.add_argument("-p", "--parents", action="store_true")

    sp = sub.add_parser("delete-namespace")
    sp.add_argument("namespace")

    sp = sub.add_parser("list-namespaces")
    sp.add_argument("parent", nargs="?")

    sp = sub.add_parser("create-table")
    sp.add_argument("table")
    sp.add_argument("--schema-from-parquet")
    sp.add_argument("--partition", type=_json_arg, default=None)
    sp.add_argument("--sort", type=_json_arg, default=None)
    sp.add_argument("--location")
    sp.add_argument("-p", "--ignore-exists", action="store_true")

    sp = sub.add_parser("alter-table")
    sp.add_argument("table")
    sp.add_argument("operations", type=_json_arg, help="JSON op list")

    sp = sub.add_parser("delete-table")
    sp.add_argument("table")
    sp.add_argument("--purge", action="store_true")

    sp = sub.add_parser("list-tables")
    sp.add_argument("namespace")

    sp = sub.add_parser("insert")
    sp.add_argument("table")
    sp.add_argument("files", nargs="*")
    sp.add_argument("--files-from")
    sp.add_argument("-p", "--create-table", action="store_true")
    sp.add_argument("--partition", type=_json_arg, default=None)
    sp.add_argument("--sort", type=_json_arg, default=None)
    sp.add_argument("--skip-duplicates", action="store_true")
    sp.add_argument("--force-duplicates", action="store_true")
    sp.add_argument("--no-copy", action="store_true")
    sp.add_argument("--force-no-copy", action="store_true")
    sp.add_argument("--no-commit", action="store_true")
    sp.add_argument("--stage", default=None, metavar="BRANCH",
                    help="write-audit-publish: commit onto a branch ref; "
                    "main does not advance until `publish`")
    sp.add_argument("--compression", default="gzip")
    sp.add_argument("--format", dest="input_format", default="parquet",
                    choices=["parquet", "csv", "json", "orc", "avro"])
    sp.add_argument("--file-naming", dest="file_naming", default="default",
                    choices=["default", "preserve"],
                    help="preserve = keep source basenames (PRESERVE_ORIGINAL)")
    sp.add_argument("--s3-copy-object", dest="s3_copy_object", action="store_true",
                    help="server-side S3 copy (s3:// source AND table only; "
                    "binds boto3 at runtime)")

    sp = sub.add_parser("scan")
    sp.add_argument("table")
    sp.add_argument("--limit", type=int, default=10)
    sp.add_argument("--snapshot", type=int, default=None)
    sp.add_argument("--as-of", dest="as_of", default=None,
                    help="ISO timestamp or epoch ms: read as of this time")
    sp.add_argument("--ref", default=None, help="read the snapshot a tag points at")
    sp.add_argument("--filter", dest="filters", type=_json_arg, default=None,
                    help='delete-style JSON filters: manifest-pruned filtered scan')

    sp = sub.add_parser("describe")
    sp.add_argument("target")
    sp.add_argument("-s", "--schema", action="store_true")
    sp.add_argument("-a", "--all", action="store_true")
    sp.add_argument("--properties", action="store_true")
    sp.add_argument("-m", "--metrics", action="store_true")

    sp = sub.add_parser("files")
    sp.add_argument("table")

    sp = sub.add_parser("list-partitions")
    sp.add_argument("table")

    sp = sub.add_parser("list-snapshots")
    sp.add_argument("table")
    sp.add_argument("--limit", type=int, default=None)

    sp = sub.add_parser("changes")
    sp.add_argument("table")
    sp.add_argument("--from-snapshot", dest="from_snapshot", type=int, default=None)
    sp.add_argument("--to-snapshot", dest="to_snapshot", type=int, default=None)
    sp.add_argument("--rows", action="store_true", help="also count appended rows")

    sp = sub.add_parser("describe-parquet")
    sp.add_argument("file")

    sp = sub.add_parser("describe-metadata")
    sp.add_argument("metadata_file")

    sp = sub.add_parser("delete")
    sp.add_argument("table")
    sp.add_argument("filters", type=_json_arg)
    sp.add_argument("--dry-run", dest="dry_run", action="store_true", default=True)
    sp.add_argument("--no-dry-run", dest="dry_run", action="store_false")
    sp.add_argument("--purge", action="store_true")

    sp = sub.add_parser(
        "rewrite-paths",
        help="stage a relocated copy of a table: rewrite absolute path "
        "prefixes in every metadata version (docs/rewrite-table-path.md "
        "workflow), emit the data-file copy plan, optionally copy data",
    )
    sp.add_argument("table")
    sp.add_argument("--target-prefix", required=True)
    sp.add_argument("--source-prefix", default=None, help="default: table location")
    sp.add_argument("--staging", default=None, help="default: <new-location>/metadata")
    sp.add_argument("--dry-run", dest="dry_run", action="store_true", default=True)
    sp.add_argument("--no-dry-run", dest="dry_run", action="store_false")
    sp.add_argument(
        "--copy-data",
        action="store_true",
        help="also copy the data files (local filesystems; object "
        "stores consume copy-plan.json with their own bulk tool)",
    )

    sp = sub.add_parser(
        "delete-rows",
        help="row-level copy-on-write DELETE WHERE (any column; "
        "bounds/Bloom-pruned rewrite)",
    )
    sp.add_argument("table")
    sp.add_argument("filters", type=_json_arg)
    sp.add_argument("--dry-run", dest="dry_run", action="store_true", default=True)
    sp.add_argument("--no-dry-run", dest="dry_run", action="store_false")

    sub.add_parser("catalog-export")

    sp = sub.add_parser("catalog-import")
    sp.add_argument("registry_file")
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--dry-run", action="store_true")

    sp = sub.add_parser(
        "registry-snapshot",
        help="dump the etcd registry (keys+values+versions) to a JSON "
        "file — the seam-level analog of the reference's etcdctl "
        "snapshot backup (docs/etcd-backup-restore-upgrade-3-node.md); "
        "requires --registry-etcd",
    )
    sp.add_argument("snapshot_file")

    sp = sub.add_parser(
        "registry-restore",
        help="restore a registry-snapshot file in one CAS-guarded etcd "
        "transaction (all-or-nothing; conflicts with concurrent "
        "writers are detected, never clobbered); requires "
        "--registry-etcd",
    )
    sp.add_argument("snapshot_file")
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--dry-run", action="store_true")

    sp = sub.add_parser("perform-maintenance")
    sp.add_argument("table", nargs="?")
    sp.add_argument("--dry-run", dest="dry_run", action="store_true", default=True)
    sp.add_argument("--no-dry-run", dest="dry_run", action="store_false")
    sp.add_argument(
        "--schedule",
        default=None,
        help="5-field cron: run as a long-lived scheduler daemon "
        "(MaintenanceScheduler parity) instead of one immediate pass",
    )
    sp.add_argument(
        "--cycles",
        type=int,
        default=None,
        help="stop the daemon after N poll cycles (default: run forever)",
    )
    sp.add_argument("--poll-sec", type=float, default=30.0)
    sp.add_argument(
        "--jitter-minutes",
        type=int,
        default=0,
        help="deterministic per-table first-fire jitter (herd spread)",
    )

    sp = sub.add_parser("create-view")
    sp.add_argument("view", help="namespaced view identifier, e.g. ns.v")
    sp.add_argument("query", help="SQL over <ns>_<table> names")
    sp.add_argument("--comment", default="")
    sp.add_argument("--replace", action="store_true")

    sp = sub.add_parser("drop-view")
    sp.add_argument("view")

    sp = sub.add_parser("list-views")
    sp.add_argument("namespace")

    sp = sub.add_parser("sql")
    sp.add_argument("query", help="SQL over catalog tables (registered as ns_table views)")
    sp.add_argument("--limit", type=int, default=100)

    sp = sub.add_parser("audit-plan")
    sp.add_argument("query", help="SQL over catalog tables, or a registered query name")
    sp.add_argument("--sf-dir", default=None,
                    help="run a registered library query against this parquet dir")

    sp = sub.add_parser("export")
    sp.add_argument("table")
    sp.add_argument("dest")
    sp.add_argument("--format", dest="out_format", default="parquet",
                    choices=["parquet", "csv", "json", "avro"])
    sp.add_argument("--snapshot", type=int, default=None)
    sp.add_argument("--compression", default="zstd")

    sp = sub.add_parser("export-iceberg")
    sp.add_argument("table")
    sp.add_argument("dest", help="directory to write Iceberg v2 metadata into")

    sp = sub.add_parser("register-iceberg")
    sp.add_argument("table", help="catalog identifier to create")
    sp.add_argument("metadata_file", help="foreign Iceberg v2 metadata.json")

    sp = sub.add_parser(
        "scan-iceberg",
        help="merge-on-read scan of a foreign Iceberg v2 table "
        "(applies position + equality deletes; works on tables "
        "register-iceberg refuses)",
    )
    sp.add_argument("metadata_file", help="foreign Iceberg v2 metadata.json")
    sp.add_argument("--snapshot", type=int, default=None)
    sp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser(
        "create-matview",
        help="materialize a groupBy aggregate of a base table as a new "
        "table with incremental refresh metadata",
    )
    sp.add_argument("matview", help="identifier for the new view table")
    sp.add_argument("base", help="base table identifier")
    sp.add_argument("--group-by", required=True, help="comma-separated group columns")
    sp.add_argument(
        "--agg",
        action="append",
        required=True,
        help="op:col:alias (op in sum/count/min/max); repeatable",
    )

    sp = sub.add_parser(
        "refresh-matview",
        help="fold base-table changes since the last refresh into the "
        "view (O(new data); full recompute if the range has deletes)",
    )
    sp.add_argument("matview")

    sp = sub.add_parser(
        "publish",
        help="fast-forward main to a staged branch (write-audit-publish)",
    )
    sp.add_argument("table")
    sp.add_argument("branch")

    sp = sub.add_parser(
        "abort-branch", help="drop a staged branch (files become orphans)"
    )
    sp.add_argument("table")
    sp.add_argument("branch")

    sp = sub.add_parser(
        "feed",
        help="drain table changes since the checkpoint (change-data "
        "feed; commit-after-output, replay-safe)",
    )
    sp.add_argument("table")
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--limit", type=int, default=20,
                    help="max rows printed per batch (all rows are consumed)")

    sp = sub.add_parser(
        "build-index",
        help="per-file Bloom index on a column: point-lookup file "
        "pruning beyond min/max bounds",
    )
    sp.add_argument("table")
    sp.add_argument("column")
    sp.add_argument("--bits", type=int, default=4096)

    sp = sub.add_parser(
        "agg-metadata",
        help="COUNT(*)/MIN/MAX from manifests alone (no data scan); "
        "errors if the answer is not provably exact",
    )
    sp.add_argument("table")
    sp.add_argument(
        "--agg",
        action="append",
        required=True,
        help="count | min:col | max:col; repeatable",
    )
    sp.add_argument("--filter", dest="filters", type=_json_arg, default=None,
                    help="delete-style JSON filters on identity partition fields")

    sp = sub.add_parser("analyze")
    sp.add_argument("table")
    sp.add_argument("--exact", action="store_true", help="exact NDV (HLL default)")

    sp = sub.add_parser("tag")
    sp.add_argument("table")
    sp.add_argument("name")
    sp.add_argument("--snapshot", type=int, default=None)
    sp.add_argument("--drop", action="store_true")

    sp = sub.add_parser("rollback")
    sp.add_argument("table")
    sp.add_argument("--to-snapshot", dest="to_snapshot", type=int, required=True)

    sp = sub.add_parser("build-corpus")
    sp.add_argument("source", help="parquet path or catalog table of raw documents")
    sp.add_argument("namespace")
    sp.add_argument("--heldout-fraction", type=float, default=0.1)
    sp.add_argument("--min-tokens", type=int, default=20)
    sp.add_argument(
        "--dedup",
        choices=["off", "auto", "capped-shingle", "minhash-lsh"],
        default="off",
        help="near-dup strategy on top of exact dedup; 'auto' routes "
        "by the measured cap audit (p04's recommendation, executed)",
    )

    sp = sub.add_parser("cluster")
    sp.add_argument("table")
    sp.add_argument("--by", required=True, help="comma-separated z-order columns")
    sp.add_argument("--target-file-size-mb", type=int, default=512)
    sp.add_argument("--dry-run", dest="dry_run", action="store_true", default=True)
    sp.add_argument("--no-dry-run", dest="dry_run", action="store_false")

    sub.add_parser("shell")

    sp = sub.add_parser("watch")
    sp.add_argument("table")
    sp.add_argument("directory")
    sp.add_argument("--fire-once", action="store_true")
    sp.add_argument("--checkpoint")
    sp.add_argument("--merge-on", dest="merge_on", default=None,
                    help="comma-separated key columns: upsert instead of append")
    sp.add_argument("--order-col", dest="order_col", default=None,
                    help="with --merge-on: highest value per key wins in a batch")

    return p


def _shell_verbs() -> list[str]:
    """All CLI verb names, pulled from the argparse tree."""
    parser = build_parser()
    for action in parser._subparsers._group_actions:  # noqa: SLF001
        return sorted(action.choices.keys())
    return []


def _install_completion(warehouse: str) -> None:
    """Tab completion for the shell (reference jline completers,
    ice/.../cli/Main.java:1106-1181): first word completes verbs,
    later words complete namespace / table identifiers from the
    catalog. readline is stdlib on POSIX; absence degrades to plain
    input() silently."""
    try:
        import readline
    except ImportError:
        return
    verbs = _shell_verbs() + ["exit", "quit"]

    def idents() -> list[str]:
        try:
            from ice_spark.catalog.catalog import Catalog

            cat = Catalog(None, warehouse)
            out: list[str] = []
            stack: list[str | None] = [None]
            while stack:
                parent = stack.pop()
                for ns in cat.list_namespaces(parent):
                    out.append(ns)
                    stack.append(ns)
                    out.extend(f"{ns}.{t}" for t in cat.list_tables(ns))
            return out
        except Exception:  # noqa: BLE001 — completion must never crash input
            return []

    def complete(text: str, state: int):
        buf = readline.get_line_buffer()
        first_word = " " not in buf.lstrip()
        pool = verbs if first_word else idents()
        matches = [w for w in pool if w.startswith(text)]
        return matches[state] if state < len(matches) else None

    readline.set_completer_delims(" \t")
    readline.set_completer(complete)
    readline.parse_and_bind("tab: complete")


def shell(warehouse: str) -> int:
    """Interactive REPL: one CLI verb per line, shared session
    (reference `shell`, ice/.../cli/Main.java:1106-1181 — with
    readline tab completion over verbs and catalog identifiers)."""
    import shlex

    _install_completion(warehouse)
    print("ice-spark shell — verbs as lines, 'exit' to quit", file=sys.stderr)
    while True:
        try:
            line = input("ice> ")
        except EOFError:
            return 0
        line = line.strip()
        if not line:
            continue
        if line in {"exit", "quit"}:
            return 0
        try:
            main(["--warehouse", warehouse, *shlex.split(line)])
        except SystemExit as e:  # argparse errors shouldn't kill the shell
            if e.code not in (0, None):
                print(f"error: exit {e.code}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - REPL survives bad commands
            print(f"error: {e}", file=sys.stderr)


def _make_catalog(spark, args):
    if getattr(args, "registry_etcd", None):
        from ice_spark.catalog.etcd_catalog import Etcd3KV, EtcdCatalog

        return EtcdCatalog(
            spark, args.warehouse, kv=Etcd3KV(args.registry_etcd)
        )
    if getattr(args, "registry_db", None):
        from ice_spark.catalog.sqlite_catalog import SqliteCatalog

        return SqliteCatalog(spark, args.warehouse, db_path=args.registry_db)
    from ice_spark.catalog import Catalog

    return Catalog(spark, args.warehouse)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "shell":
        return shell(args.warehouse)

    # describe-parquet needs no Spark at all (pyarrow footer reader,
    # like the reference's Hadoop-free Metadata.java)
    if args.cmd == "describe-parquet":
        from ice_spark.sources.parquet_meta import describe_parquet

        print(json.dumps(describe_parquet(args.file), indent=1, default=str))
        return 0
    if args.cmd == "describe-metadata":
        with open(args.metadata_file) as f:
            meta = json.load(f)
        if "format-version" in meta:
            # Iceberg metadata.json: render the DescribeMetadata.java
            # drill-down (47-220) — summary, schema w/ field ids,
            # snapshots, manifests with file counts — instead of the
            # raw dump (manifests are Avro, not human-readable).
            from ice_spark.catalog.iceberg_export import (
                read_iceberg_manifest,
                read_iceberg_manifest_list,
            )

            snapshots = []
            for s in meta.get("snapshots", []):
                entry = {
                    "snapshot_id": s["snapshot-id"],
                    "sequence_number": s.get("sequence-number"),
                    "timestamp_ms": s.get("timestamp-ms"),
                    "operation": s.get("summary", {}).get("operation"),
                    "manifest_list": s.get("manifest-list"),
                    "manifests": [],
                }
                try:
                    for mf in read_iceberg_manifest_list(s["manifest-list"]):
                        files = read_iceberg_manifest(mf["manifest_path"])
                        entry["manifests"].append(
                            {
                                "path": mf["manifest_path"],
                                "added_files": mf.get("added_files_count"),
                                "rows": mf.get("added_rows_count"),
                                "files": [
                                    e["data_file"]["file_path"] for e in files
                                ],
                            }
                        )
                except (OSError, ValueError) as e:
                    entry["manifests"] = f"unreadable: {e}"
                snapshots.append(entry)
            out = {
                "summary": {
                    "table_uuid": meta.get("table-uuid"),
                    "format_version": meta["format-version"],
                    "location": meta.get("location"),
                    "current_snapshot_id": meta.get("current-snapshot-id"),
                    "last_sequence_number": meta.get("last-sequence-number"),
                },
                # schema-id is an identifier, not a list index — a
                # table after schema evolution has sparse ids
                "schema": next(
                    (
                        s
                        for s in meta.get("schemas", [])
                        if s.get("schema-id") == meta.get("current-schema-id", 0)
                    ),
                    (meta.get("schemas") or [{}])[0],
                ),
                "partition_specs": meta.get("partition-specs"),
                "snapshots": snapshots,
            }
            print(json.dumps(out, indent=1))
        else:
            print(json.dumps(meta, indent=1))
        return 0

    if args.cmd == "serve":
        # metadata-plane only — no SparkSession needed to serve
        from ice_spark.catalog import Catalog
        from ice_spark.rest import RestCatalogServer, ServerConfig

        tokens = {}
        for spec in args.serve_token:
            tok, _, flag = spec.partition(":")
            tokens[tok] = {"read_only": flag == "ro"}
        cfg = ServerConfig(tokens=tokens, anonymous=args.anonymous or not tokens)
        srv = RestCatalogServer(_make_catalog(None, args), cfg, port=args.port).start()
        print(json.dumps({"serving": srv.url, "warehouse": args.warehouse}))
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            srv.stop()
        return 0

    from ice_spark.catalog.s3tables import is_s3tables_warehouse

    if args.uri or is_s3tables_warehouse(args.warehouse):
        out = _run_rest(args)
        print(json.dumps(out, indent=1, default=str))
        return 0

    from ice_spark.session import get_spark

    spark = get_spark("ice_spark_cli")
    cat = _make_catalog(spark, args)
    out = None

    if args.cmd == "check":
        out = {"ok": cat.check()}
    elif args.cmd == "create-namespace":
        cat.create_namespace(args.namespace, parents=args.parents, exist_ok=args.parents)
        out = {"created": args.namespace}
    elif args.cmd == "delete-namespace":
        cat.delete_namespace(args.namespace)
        out = {"deleted": args.namespace}
    elif args.cmd == "list-namespaces":
        out = cat.list_namespaces(args.parent)
    elif args.cmd == "create-table":
        t = cat.create_table(
            args.table,
            schema_from_parquet=args.schema_from_parquet,
            partition_spec=args.partition,
            sort_order=args.sort,
            location=args.location,
            exist_ok=args.ignore_exists,
        )
        out = {"created": args.table, "location": t.location}
    elif args.cmd == "alter-table":
        from ice_spark.catalog.alter import apply_operations

        ops = args.operations
        renames = [o for o in ops if "rename_to" in o]
        apply_operations(cat.load_table(args.table), [o for o in ops if "rename_to" not in o])
        for r in renames:
            cat.rename_table(args.table, r["rename_to"]["name"])
        out = {"altered": args.table, "ops": len(ops)}
    elif args.cmd == "delete-table":
        cat.drop_table(args.table, purge=args.purge)
        out = {"deleted": args.table, "purged": args.purge}
    elif args.cmd == "list-tables":
        out = cat.list_tables(args.namespace)
    elif args.cmd == "insert":
        from ice_spark.ingest import insert as do_insert

        files = list(args.files)
        if args.files_from:
            with open(args.files_from) as f:
                files += [line.strip() for line in f if line.strip()]
        # wildcard expansion (the reference's s3://...* listing,
        # S3.listWildcard — here the local-FS equivalent), sorted for
        # deterministic ingest order
        if any("*" in f or "?" in f for f in files):
            import glob as _glob

            expanded: list[str] = []
            for f in files:
                if "*" in f or "?" in f:
                    hits = sorted(_glob.glob(f))
                    if not hits:
                        raise SystemExit(f"no files match {f!r}")
                    expanded += hits
                else:
                    expanded.append(f)
            files = expanded
        if files == ["-"]:
            files = [line.strip() for line in sys.stdin if line.strip()]
        # scheme routing: file:// strip, http(s):// download-to-cache
        # (cache key = sha256(url), so URL dedup keeps working)
        from ice_spark.sources.fetch import resolve_input

        files = [resolve_input(f) for f in files]
        if args.create_table and not cat.table_exists(args.table):
            from ice_spark.ingest.insert import read_input

            cat.create_table(
                args.table,
                schema=read_input(cat.spark, files[0], args.input_format).schema,
                partition_spec=args.partition,
                sort_order=args.sort,
            )
        out = do_insert(
            cat.load_table(args.table),
            files,
            skip_duplicates=args.skip_duplicates,
            force_duplicates=args.force_duplicates,
            no_copy=args.no_copy,
            force_no_copy=args.force_no_copy,
            compression=args.compression,
            partition_spec=args.partition,
            sort_order=args.sort,
            no_commit=args.no_commit,
            stage_branch=args.stage,
            input_format=args.input_format,
            file_naming=args.file_naming,
            s3_copy_object=args.s3_copy_object,
            s3_client=_s3_client_if(args.s3_copy_object),
        )
    elif args.cmd == "create-view":
        out = cat.create_view(
            args.view, args.query, comment=args.comment, replace=args.replace
        )
    elif args.cmd == "drop-view":
        cat.drop_view(args.view)
        out = {"dropped": args.view}
    elif args.cmd == "list-views":
        out = cat.list_views(args.namespace)
    elif args.cmd == "sql":
        # Register every table and stored view as `<ns>_<name>` and run
        # the query — joins/aggs/windows over catalog tables, the whole
        # point of the Spark rebuild (SURVEY.md §2.8).
        cat.register_sql_context()
        rows = cat.spark.sql(args.query).limit(args.limit).collect()
        out = [r.asDict(recursive=True) for r in rows]
    elif args.cmd == "audit-plan":
        # Plan-shape audit (the scale contract tests/test_plans.py
        # enforces, exposed to users): shuffles, join strategies,
        # pushed filters, read schemas — for ad-hoc SQL over catalog
        # tables or a registered library query by name.
        from ice_spark.plans import audit

        if args.sf_dir:
            from ice_spark.queries.registry import load_all

            df = load_all()[args.query].spark_fn(cat.spark, args.sf_dir)
        else:
            cat.register_sql_context()
            df = cat.spark.sql(args.query)
        out = {"summary": audit(df).report().splitlines()}
    elif args.cmd == "export":
        df = cat.load_table(args.table).read(snapshot_id=args.snapshot)
        codec = args.compression
        if args.out_format != "parquet" and codec == "zstd":
            codec = "gzip"  # text codecs: Spark csv/json writers lack zstd
        if args.out_format == "avro":
            # own-codec container shards, executor-side (no spark-avro)
            from ice_spark.sources.avro_io import export_avro

            st: dict = {}
            n = export_avro(df, args.dest, stats=st)
            out = {"exported": args.table, "dest": args.dest,
                   "format": "avro", "shards": n,
                   "vectorized_batches": st["vectorized_batches"],
                   "fallback_batches": st["fallback_batches"]}
        else:
            w = df.write.mode("overwrite").option("compression", codec)
            if args.out_format == "csv":
                w = w.option("header", "true")
            getattr(w, args.out_format)(args.dest)
            out = {"exported": args.table, "dest": args.dest, "format": args.out_format}
    elif args.cmd == "export-iceberg":
        from ice_spark.catalog.iceberg_export import export_iceberg

        out = export_iceberg(cat.load_table(args.table), args.dest)
    elif args.cmd == "register-iceberg":
        from ice_spark.catalog.iceberg_import import register_iceberg_table

        t = register_iceberg_table(cat, args.table, args.metadata_file)
        out = {
            "registered": args.table,
            "files": len(t.files()),
            "records": sum(e.get("records", 0) for e in t.files()),
        }
    elif args.cmd == "scan-iceberg":
        from ice_spark.catalog.iceberg_mor import read_iceberg_mor

        df = read_iceberg_mor(
            cat.spark, args.metadata_file, snapshot_id=args.snapshot
        ).limit(args.limit)
        out = [r.asDict(recursive=True) for r in df.collect()]
    elif args.cmd == "create-matview":
        from ice_spark.operators.matview import create_matview

        aggs = []
        for spec in args.agg:
            op, col, alias = spec.split(":")
            aggs.append({"op": op, "col": col, "alias": alias})
        mv = create_matview(
            cat, args.matview, args.base, args.group_by.split(","), aggs
        )
        out = {
            "created": args.matview,
            "base": args.base,
            "rows": sum(e.get("records", 0) for e in mv.files()),
        }
    elif args.cmd == "refresh-matview":
        from ice_spark.operators.matview import refresh_matview

        out = refresh_matview(cat, args.matview)
    elif args.cmd == "rewrite-paths":
        from ice_spark.catalog.rewrite_paths import rewrite_table_path

        out = rewrite_table_path(
            cat.load_table(args.table),
            target_prefix=args.target_prefix,
            source_prefix=args.source_prefix,
            staging_location=args.staging,
            dry_run=args.dry_run,
            copy_data=args.copy_data,
        )
    elif args.cmd == "delete-rows":
        from ice_spark.catalog.delete import delete_rows

        out = delete_rows(
            cat.load_table(args.table), args.filters, dry_run=args.dry_run
        )
    elif args.cmd == "publish":
        sid = cat.load_table(args.table).publish_branch(args.branch)
        out = {"published": args.branch, "snapshot_id": sid}
    elif args.cmd == "abort-branch":
        cat.load_table(args.table).abort_branch(args.branch)
        out = {"aborted": args.branch}
    elif args.cmd == "feed":
        from ice_spark.streaming.table_changes import TableChangeFeed

        feed = TableChangeFeed(cat.load_table(args.table), args.checkpoint)
        batches = []

        def _emit(df, sid):
            batches.append(
                {
                    "snapshot_id": sid,
                    "rows": df.count(),
                    "sample": [
                        r.asDict(recursive=True) for r in df.limit(args.limit).collect()
                    ],
                }
            )

        n = feed.process_available(_emit)
        out = {"batches": n, "detail": batches}
    elif args.cmd == "build-index":
        from ice_spark.catalog.fileindex import build_bloom_index

        out = build_bloom_index(
            cat.load_table(args.table), args.column, num_bits=args.bits
        )
    elif args.cmd == "agg-metadata":
        from ice_spark.catalog.metadata_agg import aggregate_from_metadata

        specs = []
        for spec in args.agg:
            if spec == "count":
                specs.append({"op": "count"})
            else:
                op, _, col = spec.partition(":")
                specs.append({"op": op, "col": col})
        res = aggregate_from_metadata(
            cat.load_table(args.table), specs, filters=args.filters
        )
        if res is None:
            print(
                "not answerable exactly from metadata (missing bounds or "
                "non-partition filter); run a scan",
                file=sys.stderr,
            )
            return 1
        out = res
    elif args.cmd == "analyze":
        out = cat.load_table(args.table).analyze(approx=not args.exact)
    elif args.cmd == "tag":
        t = cat.load_table(args.table)
        if args.drop:
            t.drop_ref(args.name)
            out = {"dropped": args.name, "refs": t.refs()}
        else:
            sid = t.set_ref(args.name, args.snapshot)
            out = {"tagged": args.name, "snapshot_id": sid, "refs": t.refs()}
    elif args.cmd == "scan":
        t = cat.load_table(args.table)
        if args.filters is not None:
            df = t.read_filtered(args.filters).limit(args.limit)
            out = [r.asDict(recursive=True) for r in df.collect()]
        elif args.ref is not None:
            out = t.scan(limit=args.limit, snapshot_id=t.resolve_ref(args.ref))
        elif args.as_of is not None:
            try:
                ms = int(args.as_of)
            except ValueError:
                import datetime as _dt

                ms = int(_dt.datetime.fromisoformat(args.as_of).timestamp() * 1000)
            df = t.read(as_of_ms=ms).limit(args.limit)
            out = [r.asDict(recursive=True) for r in df.collect()]
        else:
            out = t.scan(limit=args.limit, snapshot_id=args.snapshot)
    elif args.cmd == "describe":
        if cat.table_exists(args.target):
            out = cat.load_table(args.target).describe(
                show_schema=args.schema or args.all,
                show_properties=args.properties or args.all,
                show_metrics=args.metrics or args.all,
            )
        else:
            out = {
                "namespace": args.target,
                "tables": cat.list_tables(args.target),
            }
    elif args.cmd == "files":
        # snapshot -> manifests -> data files tree (Files.java:30-78)
        t = cat.load_table(args.table)
        snap = t.snapshot()
        out = {
            "snapshot": snap["snapshot_id"] if snap else None,
            "manifest_list": (snap or {}).get("manifest_list")
            or (snap or {}).get("manifest"),
            "manifests": [
                {
                    "path": d["path"],
                    "file_count": d["file_count"],
                    "record_count": d["record_count"],
                    "files": [e["path"] for e in t._read_shard(d["path"])],
                }
                for d in t.manifest_list_entries(snap)
            ],
            "files": t.files(),
        }
    elif args.cmd == "list-partitions":
        t = cat.load_table(args.table)
        out = {
            "spec": t.meta.get("partition_spec", []),
            "partitions": t.partitions(),
        }
    elif args.cmd == "list-snapshots":
        snaps = cat.load_table(args.table).snapshots()
        snaps.sort(key=lambda s: s["timestamp_ms"])
        if args.limit:
            snaps = snaps[-args.limit :]
        out = snaps
    elif args.cmd == "changes":
        t = cat.load_table(args.table)
        diff = t.changed_files(args.from_snapshot, args.to_snapshot)
        out = {
            "added": [e["path"] for e in diff["added"]],
            "removed": [e["path"] for e in diff["removed"]],
            "added_records": sum(e.get("records", 0) for e in diff["added"]),
        }
        if args.rows:
            out["appended_rows"] = t.read_incremental(
                args.from_snapshot, args.to_snapshot
            ).count()
    elif args.cmd == "delete":
        from ice_spark.catalog.delete import delete as do_delete

        out = do_delete(
            cat.load_table(args.table), args.filters, dry_run=args.dry_run, purge=args.purge
        )
    elif args.cmd == "catalog-export":
        out = cat.export_registry()
    elif args.cmd == "catalog-import":
        with open(args.registry_file) as f:
            out = cat.import_registry(
                json.load(f), overwrite=args.overwrite, dry_run=args.dry_run
            )
    elif args.cmd == "registry-snapshot":
        if not hasattr(cat, "registry_snapshot"):
            raise SystemExit("registry-snapshot needs an etcd registry (--registry-etcd)")
        snap = cat.registry_snapshot()
        with open(args.snapshot_file, "w") as f:
            json.dump(snap, f, indent=1)
        out = {"keys": len(snap["keys"]), "file": args.snapshot_file}
    elif args.cmd == "registry-restore":
        if not hasattr(cat, "registry_restore"):
            raise SystemExit("registry-restore needs an etcd registry (--registry-etcd)")
        with open(args.snapshot_file) as f:
            out = cat.registry_restore(
                json.load(f), overwrite=args.overwrite, dry_run=args.dry_run
            )
    elif args.cmd == "rollback":
        t = cat.load_table(args.table)
        out = {"snapshot_id": t.rollback(args.to_snapshot), "rolled_back_to": args.to_snapshot}
    elif args.cmd == "build-corpus":
        from ice_spark.operators.pipeline import build_corpus

        docs = (
            cat.load_table(args.source).read()
            if cat.table_exists(args.source)
            else cat.spark.read.parquet(args.source)
        )
        if not cat.table_exists(args.namespace) and args.namespace not in cat.list_namespaces():
            cat.create_namespace(args.namespace, parents=True)
        out = build_corpus(
            cat,
            docs,
            args.namespace,
            heldout_fraction=args.heldout_fraction,
            min_tokens=args.min_tokens,
            near_dedup_strategy=None if args.dedup == "off" else args.dedup,
        )
    elif args.cmd == "cluster":
        from ice_spark.catalog.maintenance import cluster_files

        out = cluster_files(
            cat.load_table(args.table),
            [c.strip() for c in args.by.split(",") if c.strip()],
            target_file_size_mb=args.target_file_size_mb,
            dry_run=args.dry_run,
        )
    elif args.cmd == "perform-maintenance":
        from ice_spark.catalog.maintenance import perform_maintenance

        idents = (
            [args.table]
            if args.table
            else [
                f"{ns}.{t}"
                for ns in cat.export_registry()["namespaces"]
                for t in cat.list_tables(ns)
            ]
        )
        if args.schedule:
            import datetime as _dt

            from ice_spark.catalog.scheduler import MaintenanceSchedule, run_daemon

            sched = MaintenanceSchedule()
            now = _dt.datetime.now()
            for i in idents:
                sched.add_table_maintenance(
                    cat,
                    i,
                    args.schedule,
                    now,
                    dry_run=args.dry_run,
                    jitter_minutes=args.jitter_minutes,
                )
            out = run_daemon(sched, poll_sec=args.poll_sec, max_cycles=args.cycles)
        else:
            out = {
                i: perform_maintenance(cat.load_table(i), dry_run=args.dry_run)
                for i in idents
            }
    elif args.cmd == "watch":
        if args.merge_on:
            from ice_spark.streaming.upsert import upsert_watch

            out = upsert_watch(
                cat.load_table(args.table),
                args.directory,
                [c.strip() for c in args.merge_on.split(",") if c.strip()],
                order_col=args.order_col,
                fire_once=args.fire_once,
                checkpoint=args.checkpoint,
            )
        else:
            from ice_spark.streaming.watch import watch

            out = watch(
                cat.load_table(args.table),
                args.directory,
                fire_once=args.fire_once,
                checkpoint=args.checkpoint,
            )
    print(json.dumps(out, indent=1, default=str))
    return 0


def entrypoint() -> int:
    """Console entry: one-line errors, exit 1 (the reference prints
    clean errors, not stack traces)."""
    try:
        return main()
    except KeyboardInterrupt:
        return 130
    except BrokenPipeError:
        return 0
    except Exception as e:  # noqa: BLE001 - deliberate UX boundary
        import os

        if os.environ.get("ICE_SPARK_DEBUG"):
            raise
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(entrypoint())
