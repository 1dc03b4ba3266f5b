"""Classic-mode executor for Spark Declarative Pipelines (Spark 4.1).

``pyspark.pipelines`` is the public decorator API for dataflow graphs —
``@materialized_view`` / ``@table`` / ``@temporary_view`` /
``create_streaming_table`` + ``@append_flow`` — and ships with a runner
(``spark-pipelines``) that executes the graph through Spark Connect.
Connect needs grpcio, which this environment lacks (verified failing,
same class as Kafka/PIL/protobuf), so by the engine's env-blocked rule
the EXECUTION gets a local twin: this module implements the API's two
extension points — :class:`GraphElementRegistry` to capture
definitions, plus a topological executor — against a classic
SparkSession. Pipeline definitions are written against the PUBLIC
``pyspark.pipelines`` decorators only; nothing here forks their
semantics:

- materialized views / tables fully refresh (overwrite) into
  ``<storage>/<name>`` parquet, honoring ``partition_cols`` — matching
  SDP's batch-flow full-refresh semantics;
- streaming tables are INCREMENTAL: each append flow drains
  availableNow through its own checkpoint under the storage root, so
  re-running the pipeline processes only new input (exactly-once via
  the file sink log) — matching SDP's streaming-flow semantics;
- temporary views resolve inside the graph but nothing is persisted;
- dependency order is discovered, not declared: flows that fail
  analysis with TABLE_OR_VIEW_NOT_FOUND are deferred until a pass
  materializes their upstream, and a pass that makes no progress
  reports the unresolved names (cycles and typos fail loudly with the
  same message shape).

Scale note: the executor itself never touches data — it sequences
Spark jobs. Every materialization is a plain DataFrame write, so each
stage gets whatever parallelism its plan has; the DAG adds zero
driver-side data movement.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

from pyspark.errors import AnalysisException
from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import GraphElementRegistry
from pyspark.pipelines.output import (
    MaterializedView,
    Output,
    Sink,
    StreamingTable,
    Table,
    TemporaryView,
)
from pyspark.pipelines.source_code_location import SourceCodeLocation
from pyspark.sql import DataFrame, SparkSession


class LocalGraphRegistry(GraphElementRegistry):
    """Captures a pipeline's outputs and flows for local execution."""

    def __init__(self) -> None:
        self.outputs: dict[str, Output] = {}
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        if "." in output.name:
            raise ValueError(
                f"local pipeline executor uses session temp views; "
                f"multi-part name {output.name!r} is not supported"
            )
        if output.name in self.outputs:
            raise ValueError(f"duplicate output name: {output.name}")
        self.outputs[output.name] = output

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    # minimal SQL-definition support: the subset of SDP SQL files the
    # local twin accepts (one CREATE ... AS SELECT per statement)
    _SQL_DEF = re.compile(
        r"^\s*CREATE\s+(MATERIALIZED\s+VIEW|TEMPORARY\s+VIEW)\s+"
        r"(\w+)\s+AS\s+(.+)$",
        re.IGNORECASE | re.DOTALL,
    )

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        loc = SourceCodeLocation(filename=str(file_path), line_number=None)
        for stmt in (s for s in sql_text.split(";") if s.strip()):
            m = self._SQL_DEF.match(stmt)
            if not m:
                raise ValueError(
                    f"unsupported SQL pipeline statement in {file_path}: "
                    f"{stmt.strip()[:80]!r} (local twin accepts "
                    f"CREATE MATERIALIZED VIEW|TEMPORARY VIEW <name> AS <query>)"
                )
            kind, name, body = m.group(1).upper(), m.group(2), m.group(3)
            if kind.startswith("MATERIALIZED"):
                self.register_output(
                    MaterializedView(
                        name=name, comment=None, source_code_location=loc,
                        table_properties={}, partition_cols=None,
                        cluster_by=None, schema=None, format=None,
                    )
                )
            else:
                self.register_output(
                    TemporaryView(
                        name=name, comment=None, source_code_location=loc
                    )
                )
            # bind the statement text now, the session at run time
            self.flows.append(
                Flow(
                    name=f"{name}_sql_flow",
                    target=name,
                    spark_conf={},
                    source_code_location=loc,
                    func=_SqlFlowFunc(body),
                )
            )


class _SqlFlowFunc:
    """A Flow.func for SQL-defined datasets; the executor injects the
    session before calling (SDP's SQL flows likewise resolve against
    the pipeline's session, not a captured one)."""

    def __init__(self, body: str) -> None:
        self.body = body
        self.spark: SparkSession | None = None

    def __call__(self) -> DataFrame:
        assert self.spark is not None, "executor must bind the session"
        return self.spark.sql(self.body)


def _is_missing_relation(exc: AnalysisException) -> bool:
    cond = exc.getCondition() or ""
    return "TABLE_OR_VIEW_NOT_FOUND" in cond or "UNRESOLVED_RELATION" in cond


def run_pipeline(
    spark: SparkSession,
    registry: LocalGraphRegistry,
    storage: str,
) -> dict[str, DataFrame]:
    """Execute a captured graph: materialize every output in dependency
    order, register each as a session temp view, and return
    ``{name: DataFrame}`` for all NON-temporary outputs.

    Idempotent by construction: batch outputs overwrite, streaming
    tables resume their checkpoints (a second run with unchanged input
    is a no-op for them).
    """
    os.makedirs(storage, exist_ok=True)
    flows_by_target: dict[str, list[Flow]] = {}
    for f in registry.flows:
        if f.target not in registry.outputs:
            raise ValueError(f"flow {f.name!r} targets unknown dataset {f.target!r}")
        flows_by_target.setdefault(f.target, []).append(f)
    for name, out in registry.outputs.items():
        n_flows = len(flows_by_target.get(name, []))
        if n_flows == 0:
            raise ValueError(f"dataset {name!r} has no flow defining it")
        if n_flows > 1 and not isinstance(out, (StreamingTable, Sink)):
            raise ValueError(
                f"{name!r} has {n_flows} flows; only streaming tables "
                f"and sinks accept multiple append flows"
            )
        if (
            isinstance(out, Sink)
            and n_flows > 1
            and out.format not in ("console", "noop")
        ):
            # one file-sink transaction log per path: two flows into one
            # file-format sink would fight over _spark_metadata
            raise ValueError(
                f"sink {name!r} ({out.format}) accepts one flow; "
                f"declare one sink per flow for file formats"
            )

    # Dependency order is discovered by probing: an output whose SQL/
    # function references a not-yet-materialized sibling raises
    # TABLE_OR_VIEW_NOT_FOUND and is retried next sweep. That probe is
    # only sound if no STALE binding can answer for an upstream — a
    # previous run in this same session left every output registered as
    # a session temp view (with its parquet file listing snapshotted),
    # so a re-run would silently resolve a downstream against last
    # run's data instead of deferring. Drop all graph-owned temp views
    # up front so unmaterialized upstreams always raise.
    for name in registry.outputs:
        spark.catalog.dropTempView(name)

    pending = set(registry.outputs)
    results: dict[str, DataFrame] = {}
    while pending:
        progressed = []
        blocked: dict[str, str] = {}
        for name in sorted(pending):
            try:
                df = _materialize(
                    spark, registry.outputs[name], flows_by_target[name], storage
                )
            except AnalysisException as exc:
                if _is_missing_relation(exc):
                    # upstream not materialized yet (or a genuine typo —
                    # surfaced below if nothing ever progresses)
                    blocked[name] = str(exc).split("\n")[0]
                    continue
                raise
            if df is not None:  # sinks are external: nothing to register
                df.createOrReplaceTempView(name)
                if not isinstance(registry.outputs[name], TemporaryView):
                    results[name] = df
            progressed.append(name)
        if not progressed:
            detail = "; ".join(f"{k}: {v}" for k, v in sorted(blocked.items()))
            raise ValueError(
                f"pipeline cannot make progress — unresolved relations "
                f"(cycle or missing upstream): {detail}"
            )
        pending -= set(progressed)
    return results


def _materialize(
    spark: SparkSession, out: Output, flows: list[Flow], storage: str
) -> DataFrame | None:
    if isinstance(out, TemporaryView):
        return _bind(spark, flows[0])()

    if isinstance(out, Sink):
        # external destination: each flow streams out availableNow and
        # the pipeline manages only the checkpoints, never the data
        for f in flows:
            sdf = _bind(spark, f)()
            if not sdf.isStreaming:
                raise ValueError(
                    f"flow {f.name!r} to sink {out.name!r} returned a "
                    f"batch DataFrame; sinks take streaming flows"
                )
            q = (
                sdf.writeStream.format(out.format)
                .options(**dict(out.options))
                .option(
                    "checkpointLocation",
                    os.path.join(storage, "_checkpoints", out.name, f.name),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(3600)
        return None

    path = os.path.join(storage, out.name)
    fmt = out.format or "parquet"
    if isinstance(out, StreamingTable):
        # one sub-directory per flow: each file-sink transaction log has
        # exactly one writing query, so flows never share a _spark_metadata;
        # @dp.table's BATCH query function also lands here (the API
        # registers it as a StreamingTable with one batch flow) — a batch
        # flow is a FULL REFRESH of its slice (overwrite = idempotent
        # across reruns), a streaming flow appends incrementally through
        # its checkpoint
        for f in flows:
            sdf = _bind(spark, f)()
            sub = os.path.join(path, f.name)
            if not sdf.isStreaming:
                writer = sdf.write.mode("overwrite").format(fmt)
                if out.partition_cols:
                    writer = writer.partitionBy(*out.partition_cols)
                writer.save(sub)
                continue
            q = (
                sdf.writeStream.format(fmt)
                .option("path", sub)
                .option(
                    "checkpointLocation",
                    os.path.join(storage, "_checkpoints", out.name, f.name),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(3600)
        return spark.read.format(fmt).load(
            *[os.path.join(path, f.name) for f in flows]
        )

    assert isinstance(out, (MaterializedView, Table)), out
    df = _bind(spark, flows[0])()
    if df.isStreaming:
        raise ValueError(
            f"{out.name!r} is a batch dataset but its flow is streaming; "
            f"use create_streaming_table + append_flow"
        )
    writer = df.write.mode("overwrite").format(out.format or "parquet")
    if out.partition_cols:
        writer = writer.partitionBy(*out.partition_cols)
    writer.save(path)
    return spark.read.format(out.format or "parquet").load(path)


def _bind(spark: SparkSession, flow: Flow):
    if isinstance(flow.func, _SqlFlowFunc):
        flow.func.spark = spark
    return flow.func
