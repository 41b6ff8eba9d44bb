"""CLI entry point: ``python -m enrich_spark --config app.hocon …``.

Mirrors the reference's boot path (core/EnrichApp.scala:49 → Run.scala:
parse the HOCON app config, load the enrichments directory + iglu
resolver, build the Environment, run the stream). Runnable transports:

- ``file`` (input.path in the config, or --input on the command line):
  batch by default, Structured Streaming with --stream
- ``kinesis`` with ``input.customEndpoint`` set (dev/localstack), and
  ``pubsub`` with ``$PUBSUB_EMULATOR_HOST``: the checkpointed pull
  loop (streaming/pull_runner.py) — drain-and-exit by default,
  ``--follow`` to keep polling

Everything writes good TSV, bad JSON, and failed TSV under --output.
Transports without any reachable broker assemble and PRINT the
resolved plan config (dry run).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _json_default(o):
    if dataclasses.is_dataclass(o) and not isinstance(o, type):
        return dataclasses.asdict(o)
    return str(o)


def _curate_main(argv) -> int:
    """``python -m enrich_spark curate``: run a declarative corpus
    curation pipeline (datapipe/pipeline.py) over a parquet document
    table — the datapipe counterpart of the enrichment boot path."""
    ap = argparse.ArgumentParser(
        prog="python -m enrich_spark curate",
        description="Run a JSON-configured corpus-curation pipeline "
                    "(see datapipe/pipeline.py for the op registry).")
    ap.add_argument("--pipeline", required=True,
                    help="JSON file: [{'op': name, ...params}, ...]")
    ap.add_argument("--input", required=True,
                    help="parquet directory/file with the document table")
    ap.add_argument("--output", help="output parquet directory; omit "
                                     "with --report-only")
    ap.add_argument("--report", action="store_true",
                    help="print per-step retention counts (rides the "
                         "single write pass via observe())")
    ap.add_argument("--report-only", action="store_true",
                    help="report retention without writing output "
                         "(one count per step)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)
    if not args.output and not args.report_only:
        print("--output is required unless --report-only", file=sys.stderr)
        return 2

    from .datapipe.pipeline import run_pipeline, run_pipeline_observed
    from .session import get_spark

    spark = get_spark("enrich-spark-curate", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.input)
    n_in = docs.count()
    if args.report_only:
        report: list = []
        run_pipeline(docs, args.pipeline, report=report)
        print(json.dumps({"rows_in": n_in,
                          "steps": [{"op": op, "rows_after": n}
                                    for op, n in report]}, indent=2))
        return 0
    if args.report:
        out, get_report = run_pipeline_observed(docs, args.pipeline)
        out.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows_in": n_in,
                          "steps": [{"op": op, "rows_after": n}
                                    for op, n in get_report()]}, indent=2))
    else:
        out = run_pipeline(docs, args.pipeline)
        out.write.mode("overwrite").parquet(args.output)
    print(f"done: curated corpus under {args.output}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "curate":
        return _curate_main(argv[1:])
    ap = argparse.ArgumentParser(
        prog="python -m enrich_spark",
        description="Spark-native snowplow/enrich: run the enrichment "
                    "pipeline from the reference's HOCON app config.")
    ap.add_argument("--config", required=True, help="HOCON app config file")
    ap.add_argument("--enrichments", help="directory of enrichment JSON configs")
    ap.add_argument("--iglu-resolver", help="iglu_resolver.json path")
    ap.add_argument("--input", help="override: directory of parquet files "
                                    "with a `value BINARY` column")
    ap.add_argument("--output", help="output directory (good/ bad/ failed/)")
    ap.add_argument("--stream", action="store_true",
                    help="run as a Structured Streaming job (file transport)")
    ap.add_argument("--follow", action="store_true",
                    help="pull transports: keep polling after the drain "
                         "(default: process everything available, exit)")
    ap.add_argument("--poll-seconds", type=float, default=1.0,
                    help="pull transports: idle poll interval with --follow")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--dry-run", action="store_true",
                    help="parse + assemble only; print the resolved config")
    args = ap.parse_args(argv)

    from .appconfig import assemble_plan, load_app_config

    app = load_app_config(args.config)
    if not app.license_accepted:
        print("license.accept must be true (reference Run.scala refuses "
              "to boot otherwise)", file=sys.stderr)
        return 2

    cfg = assemble_plan(app, args.enrichments, args.iglu_resolver)

    input_path = args.input or (
        app.source.get("path") if isinstance(app.source, dict) else None)

    # pull transports are runnable without a managed connector when a
    # dev endpoint is configured: kinesis via input.customEndpoint,
    # pubsub via $PUBSUB_EMULATOR_HOST (the standard emulator contract)
    make_pull_source = None
    if input_path is None:
        if (app.transport == "kinesis"
                and getattr(app.source, "endpoint_url", None)):
            def make_pull_source():
                from .streaming.pull_runner import KinesisPullSource

                return KinesisPullSource(app.source)
        elif (app.transport == "pubsub"
                and os.environ.get("PUBSUB_EMULATOR_HOST")):
            def make_pull_source():
                from .sources.pubsub import PubSubPullConf
                from .streaming.pull_runner import PubSubPullSource

                return PubSubPullSource(PubSubPullConf(
                    subscription=app.source.subscription,
                    emulator_host=os.environ["PUBSUB_EMULATOR_HOST"]))

    runnable = input_path is not None or make_pull_source is not None

    summary = {
        "transport": app.transport,
        "source": app.source,
        "sinks": app.sinks,
        "cpu_parallelism_fraction": app.cpu_parallelism_fraction,
        "sink_parallelism_fraction": app.sink_parallelism_fraction,
        "unhealthy_latency_s": app.health_probe.unhealthy_latency_s,
        "validation": app.validation,
        "decompression": app.decompression,
        "metadata": app.metadata,
        "runnable_in_this_environment": bool(runnable),
    }
    print(json.dumps(summary, default=_json_default, indent=2))
    if args.dry_run or not runnable:
        if not runnable and not args.dry_run:
            print(f"\ninput transport '{app.transport}' needs a broker — "
                  "assembled the plan config only. Pass --input DIR to run "
                  "the same pipeline over files.", file=sys.stderr)
        return 0

    if not args.output:
        print("--output is required to run", file=sys.stderr)
        return 2

    from .session import get_spark
    from .streaming.runner import StreamSinks, run_batch, run_stream

    spark = get_spark("enrich-spark-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = args.output
    if make_pull_source is not None:
        # pull transport (kinesis dev endpoint / pubsub emulator):
        # checkpointed microbatch loop with commit-after-sinks
        from .streaming.pull_runner import run_pull_stream

        sinks = StreamSinks(
            good_path=os.path.join(out, "good"),
            bad_path=os.path.join(out, "bad"),
            failed_path=os.path.join(out, "failed"),
            metadata_path=os.path.join(out, "metadata"),
        )
        cfg.checkpoint = cfg.checkpoint or os.path.join(out, "_checkpoint")
        pq = run_pull_stream(spark, make_pull_source(), sinks, cfg)
        if args.follow:
            pq.run(poll_seconds=args.poll_seconds)
        else:
            n = pq.process_available()
            print(f"drained {n} micro-batch(es)", file=sys.stderr)
    elif args.stream:
        # observability floor from the app config (statsd metrics, the
        # 2-minute-default health probe on its HTTP port, the iglu
        # metadata webhook reporter)
        from .streaming.observability import (
            BatchObservers, HealthProbe, MetadataReporter, Metrics,
            udp_sender,
        )

        metrics = None
        if app.statsd is not None and app.statsd.hostname:
            metrics = Metrics(
                prefix=app.statsd.prefix, tags=app.statsd.tags,
                period_s=app.statsd.period_s,
                sender=udp_sender(app.statsd.hostname, app.statsd.port))
        health = HealthProbe(app.health_probe.unhealthy_latency_s)
        health.serve(app.health_probe.port)
        reporter = None
        if app.metadata is not None and app.metadata.endpoint:
            import urllib.request

            def _post(url, body):
                req = urllib.request.Request(
                    url, data=body.encode(), method="POST",
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=5) as r:
                    return r.status

            reporter = MetadataReporter(
                endpoint=app.metadata.endpoint,
                organization_id=app.metadata.organization_id,
                pipeline_id=app.metadata.pipeline_id,
                interval_s=app.metadata.interval_s,
                max_body_size=app.metadata.max_body_size,
                post=_post)
        cfg.observers = BatchObservers(
            metrics=metrics, health=health, metadata=reporter)
        sinks = StreamSinks(
            good_path=os.path.join(out, "good"),
            bad_path=os.path.join(out, "bad"),
            failed_path=os.path.join(out, "failed"),
            metadata_path=os.path.join(out, "metadata"),
        )
        source = (spark.readStream.schema("value BINARY")
                  .option("recursiveFileLookup", "true").parquet(input_path))
        cfg.checkpoint = cfg.checkpoint or os.path.join(out, "_checkpoint")
        sq = run_stream(spark, source, sinks, cfg)
        sq.processAllAvailable()
        sq.stop()
    else:
        good, bad, failed, meta, _ = run_batch(
            spark, spark.read.parquet(input_path), cfg)
        good.write.mode("overwrite").text(os.path.join(out, "good"))
        bad.withColumnRenamed("bad_row", "value") \
           .write.mode("overwrite").text(os.path.join(out, "bad"))
        failed.write.mode("overwrite").text(os.path.join(out, "failed"))
    print(f"done: outputs under {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
