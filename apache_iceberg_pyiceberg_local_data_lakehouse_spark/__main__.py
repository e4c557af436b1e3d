"""CLI entry point (reference ``lakehouse_scheduler.py`` argparse surface,
``:194-211`` - ST6).

    python -m apache_iceberg_pyiceberg_local_data_lakehouse_spark \
        --source "Training Batch" --warehouse warehouse [--now|--watch|--schedule]

Default (no mode flag) = production mode: watcher + scheduler threads.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="PySpark lakehouse ingest")
    ap.add_argument("--source", required=True, help="source root (symbol folders)")
    ap.add_argument("--warehouse", required=True, help="warehouse directory")
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--now", action="store_true", help="one batch run")
    mode.add_argument("--watch", action="store_true", help="watcher loop only")
    mode.add_argument("--schedule", action="store_true", help="daily scheduler only")
    mode.add_argument(
        "--maintain",
        action="store_true",
        help="one auto-maintenance pass over every table (policy-driven "
        "tombstone consolidation / compaction / manifest rewrite / "
        "snapshot expiry; add --dry-run to preview)",
    )
    ap.add_argument("--interval", type=int, default=30, help="watch poll seconds")
    ap.add_argument(
        "--dry-run", action="store_true", help="with --maintain: report only"
    )
    args = ap.parse_args()

    from .ingest import IngestPipeline
    from .session import get_spark
    from .streaming.watcher import FolderWatcher, Scheduler, run_production

    spark = get_spark(app_name="lakehouse-cli")

    if args.maintain:
        from .catalog import LakehouseCatalog
        from .maintenance import auto_maintain, table_metrics

        cat = LakehouseCatalog(spark, args.warehouse)
        for ns in cat.list_namespaces():
            for ident in cat.list_tables(ns):
                t = cat.load_table(ident)
                report = auto_maintain(t, dry_run=args.dry_run)
                m = table_metrics(t)
                acted = {
                    k: v for k, v in report.items() if v != "not due"
                }
                print(
                    f"{ident}: files={m['data_files']} rows={m['rows']} "
                    f"small_ratio={m['small_file_ratio']:.2f} "
                    f"{acted or 'nothing due'}"
                )
        return

    pipeline = IngestPipeline(spark, args.warehouse)

    if args.now:
        s = pipeline.run(args.source)
        print(
            f"run {s.run_id}: +{s.rows_appended} rows, "
            f"{s.files_processed} files, {s.files_rejected} rejected, "
            f"{s.files_skipped} skipped in {s.duration_secs:.1f}s"
        )
        return

    if args.watch:
        watcher = FolderWatcher(args.source)
        while True:
            if watcher.has_changes():
                pipeline.run(args.source)
            time.sleep(args.interval)

    if args.schedule:
        sched = Scheduler()
        while True:
            if sched.should_run():
                pipeline.run(args.source)
                sched.mark_ran()
            time.sleep(60)

    stop, threads = run_production(pipeline, args.source, args.interval)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        stop.set()


if __name__ == "__main__":
    main()
