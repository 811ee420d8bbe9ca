"""Sinks (SURVEY.md §2.8): pluggable output registry.

The reference ships ~36 vendor integrations, all the same mechanism:
``forward`` pushes events through a client (streams.clj:1255-1261),
registered in config (config.clj:7-56). We implement the MECHANISM:
a named-sink registry + foreachBatch multiplexing. Data sinks (kafka,
parquet, delta-style paths, console, memory) are native writeStream
formats; webhook-shaped vendors are one ``http_sink`` away.

``fan_out`` reproduces the reference's core property that every event
reaches every registered stream (core.clj:15-20): one source feeding N
independently-trigger-able sinks via foreachBatch (single scan per
micro-batch, no re-read per sink).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

SinkFn = Callable[[DataFrame, int], None]

_REGISTRY: dict[str, Callable[..., SinkFn]] = {}


def register_sink(name: str):
    def deco(factory: Callable[..., SinkFn]):
        _REGISTRY[name] = factory
        return factory

    return deco


def make_sink(name: str, **opts: Any) -> SinkFn:
    return _REGISTRY[name](**opts)


@register_sink("parquet")
def _parquet_sink(path: str, partition_by: tuple[str, ...] = ()) -> SinkFn:
    """Append micro-batches as parquet; partition columns are the
    at-scale pruning story (e.g. service/day)."""

    def write(df: DataFrame, batch_id: int) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return write


@register_sink("parquet_exactly_once")
def _parquet_idempotent_sink(path: str, partition_by: tuple[str, ...] = ()) -> SinkFn:
    """Exactly-once parquet landing under foreachBatch's at-least-once
    contract: a micro-batch REPLAYED after a crash (same batch_id)
    must not double-append. Each batch writes to a batch_id-named
    subdirectory with a _COMMIT marker written last; a replay that
    finds the marker skips, a replay over a torn write (dir without
    marker) overwrites it. Readers take ``{path}/batch_id=*`` hive
    layout and see only committed batches if they filter on the
    marker-listed ids — or simply read all, since torn dirs are
    overwritten in place before the marker lands."""

    def write(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        batch_dir = f"{path}/batch_id={batch_id}"
        marker = jvm.org.apache.hadoop.fs.Path(f"{batch_dir}/_COMMIT")
        fs = marker.getFileSystem(conf)
        if fs.exists(marker):
            return  # replay of a committed batch: exactly-once no-op
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(batch_dir)
        fs.create(marker, True).close()

    return write


@register_sink("console")
def _console_sink(limit: int = 20) -> SinkFn:
    def write(df: DataFrame, batch_id: int) -> None:
        df.show(limit, truncate=False)

    return write


@register_sink("collect")
def _collect_sink(store: list) -> SinkFn:
    """Test sink — the reference's ``append``/``register`` atoms
    (streams.clj:1243-1253)."""

    def write(df: DataFrame, batch_id: int) -> None:
        store.extend(df.collect())

    return write


@register_sink("kafka")
def _kafka_sink(bootstrap_servers: str, topic: str) -> SinkFn:
    from riemann_spark.sources.json_codec import events_to_json

    def write(df: DataFrame, batch_id: int) -> None:
        (
            events_to_json(df)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )

    return write


@register_sink("http")
def _http_sink(url: str, batch_limit: int = 1000) -> SinkFn:
    """Webhook-shaped vendor sinks (slack/pagerduty/… parity): POST
    JSON event batches. Collects at most batch_limit rows per
    micro-batch to the driver — alerting-volume data only, never the
    raw stream (route raw data to kafka/parquet sinks)."""
    import urllib.request

    def write(df: DataFrame, batch_id: int) -> None:
        rows = df.limit(batch_limit).toJSON().collect()
        body = ("[" + ",".join(rows) + "]").encode()
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"}
        )
        urllib.request.urlopen(req, timeout=10)

    return write


def _render_template(obj: Any, row: dict) -> Any:
    """Recursively substitute ``{field}`` placeholders in string leaves
    of a JSON-shaped template with event values (missing/None → '')."""

    class _Safe(dict):
        def __missing__(self, k):  # tolerate fields absent from the row
            return ""

    vals = _Safe({k: ("" if v is None else v) for k, v in row.items()})
    if isinstance(obj, str):
        return obj.format_map(vals)
    if isinstance(obj, dict):
        return {k: _render_template(v, row) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_render_template(v, row) for v in obj]
    return obj


@register_sink("webhook")
def _webhook_sink(
    url: str,
    template: dict,
    headers: dict | None = None,
    batch_limit: int = 1000,
) -> SinkFn:
    """Generic templated-webhook sink — ONE registration covering the
    reference's webhook-vendor family (pagerduty.clj:91 format-event,
    slack.clj:71 slack-formatter, and every client in config.clj:7-56
    that is 'POST a JSON body per event'): ``template`` is a
    JSON-shaped dict whose string leaves carry ``{field}``
    placeholders, rendered per event and POSTed one request per event
    (the vendors' per-alert contract).

    Shapes (see docs/QUERIES.md cookbook):
      slack     → {"text": "{host} {service} is {state} ({metric})"}
      pagerduty → {"routing_key": "KEY", "event_action": "trigger",
                   "payload": {"summary": "{service} on {host}",
                               "source": "{host}", "severity": "critical"}}
      msteams   → {"@type": "MessageCard", "title": "{service}",
                   "text": "{state} on {host}"}

    Alert-volume streams only: collects at most ``batch_limit`` rows
    per micro-batch to the driver, like the http sink — never the raw
    firehose."""
    import urllib.request

    def write(df: DataFrame, batch_id: int) -> None:
        rows = df.limit(batch_limit).collect()
        for row in rows:
            body = json.dumps(_render_template(template, row.asDict())).encode()
            req = urllib.request.Request(
                url,
                data=body,
                headers={"Content-Type": "application/json", **(headers or {})},
            )
            urllib.request.urlopen(req, timeout=10)

    return write


def fan_out(sinks: list[SinkFn]) -> Callable[[DataFrame, int], None]:
    """foreachBatch function sending each micro-batch to every sink.
    The batch is persisted once so N sinks don't rescan the source."""

    def for_each_batch(batch_df: DataFrame, batch_id: int) -> None:
        if len(sinks) > 1:
            batch_df.persist()
        try:
            for sink in sinks:
                sink(batch_df, batch_id)
        finally:
            if len(sinks) > 1:
                batch_df.unpersist()

    return for_each_batch


def write_stream(
    df: DataFrame,
    sinks: list[SinkFn],
    checkpoint: str,
    trigger_seconds: float | None = None,
    query_name: str | None = None,
):
    """Start a streaming query pushing to the given sinks.
    ``trigger_seconds`` maps the reference's every!-scheduled emission
    cadence (time.clj:129-140) to Trigger.ProcessingTime."""
    w = df.writeStream.foreachBatch(fan_out(sinks)).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds is not None:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    if query_name:
        w = w.queryName(query_name)
    return w.start()


@register_sink("influxdb")
def _influxdb_sink(
    url: str,
    tag_fields: tuple[str, ...] = ("host",),
    precision: str = "seconds",
    batch_limit: int = 10000,
) -> SinkFn:
    """InfluxDB sink (influxdb.clj:271): events encoded JVM-side to the
    line protocol (sources/tsdb_lines.py), POSTed newline-joined to the
    /write endpoint. Only the encoded LINES are collected (capped at
    batch_limit), never event objects — the formatting stays
    distributed; route raw-volume egress to kafka/parquet."""
    import urllib.request

    from riemann_spark.sources.tsdb_lines import events_to_influx_lines

    def write(df: DataFrame, batch_id: int) -> None:
        lines = [
            r["line"]
            for r in events_to_influx_lines(
                df, tag_fields=tag_fields, precision=precision
            )
            .limit(batch_limit)
            .collect()
        ]
        if not lines:
            return
        req = urllib.request.Request(
            url,
            data=("\n".join(lines) + "\n").encode(),
            headers={"Content-Type": "text/plain; charset=utf-8"},
        )
        urllib.request.urlopen(req, timeout=10)

    return write


@register_sink("prometheus")
def _prometheus_sink(
    url: str,
    label_fields: tuple[str, ...] = ("host",),
    batch_limit: int = 10000,
) -> SinkFn:
    """Prometheus pushgateway sink (prometheus.clj:118-145): events
    encoded JVM-side to exposition text (sources/tsdb_lines.py) and
    POSTed as one body per micro-batch — the reference's
    prometheus-batch shape."""
    import urllib.request

    from riemann_spark.sources.tsdb_lines import events_to_prometheus_text

    def write(df: DataFrame, batch_id: int) -> None:
        lines = [
            r["line"]
            for r in events_to_prometheus_text(df, label_fields=label_fields)
            .limit(batch_limit)
            .collect()
        ]
        if not lines:
            return
        req = urllib.request.Request(
            url,
            data=("\n".join(lines) + "\n").encode(),
            headers={"Content-Type": "text/plain; version=0.0.4"},
        )
        urllib.request.urlopen(req, timeout=10)

    return write


@register_sink("prometheus_remote_write")
def _prometheus_remote_write_sink(url: str, batch_limit: int = 10000) -> SinkFn:
    """Prometheus remote-write sink: snappy-compressed prompb
    WriteRequest POSTed with the remote-write headers — what a modern
    Prometheus/Mimir/Thanos receiver speaks (the exposition-text
    'prometheus' sink above is the pushgateway-era path). Rows are
    collected capped at batch_limit; the codec itself is pure Python
    (sources/prometheus_rw.py), no snappy/protobuf packages needed."""
    import urllib.request

    from riemann_spark.sources.prometheus_rw import (
        encode_write_request,
        snappy_compress,
    )

    def write(df: DataFrame, batch_id: int) -> None:
        cols = [c for c in ("host", "service", "metric", "tags", "time")
                if c in df.columns]
        rows = [r.asDict() for r in df.select(*cols).limit(batch_limit).collect()]
        body = encode_write_request(rows)
        if not body:
            return
        req = urllib.request.Request(
            url,
            data=snappy_compress(body),
            headers={
                "Content-Type": "application/x-protobuf",
                "Content-Encoding": "snappy",
                "X-Prometheus-Remote-Write-Version": "0.1.0",
            },
        )
        urllib.request.urlopen(req, timeout=10)

    return write


@register_sink("rabbitmq")
def _rabbitmq_sink(
    host: str = "127.0.0.1",
    port: int = 5672,
    exchange: str = "riemann",
    exchange_type: str = "topic",
    routing_key: str | Callable[[dict], str] = "riemann.events",
    batch_limit: int = 5000,
    vhost: str = "/",
    username: str = "guest",
    password: str = "guest",
) -> SinkFn:
    """rabbitmq forwarder (rabbitmq.clj:1-76): one JSON message per
    event published to a declared topic exchange over the pure-stdlib
    AMQP 0-9-1 client (sources/amqp.py). ``routing_key`` may be a
    string or a function of the event dict, like the reference's
    fn-or-string option (:routing-key, rabbitmq.clj:33). Alert-volume
    streams only (driver-collected, batch_limit-capped) — raw-volume
    egress belongs on the kafka/parquet sinks."""

    def write(df: DataFrame, batch_id: int) -> None:
        from riemann_spark.sources.amqp import AmqpPublisher

        cols = [c for c in ("host", "service", "state", "description",
                            "metric", "tags", "time", "ttl") if c in df.columns]
        rows = df.select(*cols).limit(batch_limit).collect()
        if not rows:
            return
        with AmqpPublisher(host, port, vhost=vhost, exchange=exchange,
                           exchange_type=exchange_type,
                           username=username, password=password) as pub:
            for row in rows:
                ev = {k: v for k, v in row.asDict().items() if v is not None}
                rk = routing_key(ev) if callable(routing_key) else routing_key
                pub.publish_event(ev, rk)

    return write


@register_sink("email")
def _email_sink(
    to: str | list[str],
    host: str = "localhost",
    port: int = 25,
    from_addr: str = "riemann",
    subject=None,
    body=None,
    user: str | None = None,
    password: str | None = None,
    tls: bool = False,
    ssl: bool = False,
    batch_limit: int = 1000,
) -> SinkFn:
    """SMTP mailer (email.clj:1-90): one message per micro-batch over
    the collected events — exactly ``email-event``'s sequence
    behavior, with the reference's default subject/body formatters
    (common.clj:246-295) unless overridden by ``subject``/``body``
    callables. Alert-volume streams only (a human inbox is the other
    end): driver-collected, batch_limit-capped like the http/webhook
    sinks."""
    from riemann_spark.streaming.email import email_event

    recipients = [to] if isinstance(to, str) else list(to)
    smtp_opts = {"host": host, "port": port, "user": user,
                 "password": password, "tls": tls, "ssl": ssl}

    def write(df: DataFrame, batch_id: int) -> None:
        cols = [c for c in ("host", "service", "state", "description",
                            "metric", "tags", "time", "ttl") if c in df.columns]
        rows = df.select(*cols).limit(batch_limit).collect()
        events = [
            {k: v for k, v in row.asDict().items() if v is not None} for row in rows
        ]
        if not events:
            return
        msg_opts: dict = {"from": from_addr, "to": recipients}
        if subject is not None:
            msg_opts["subject"] = subject
        if body is not None:
            msg_opts["body"] = body
        email_event(smtp_opts, msg_opts, events)

    return write


@register_sink("riemann")
def _riemann_forward_sink(
    host: str,
    port: int,
    batch_limit: int = 5000,
    ca_cert: str | None = None,
) -> SinkFn:
    """``forward`` (streams.clj:1255-1261): push events to another
    riemann server over the real TCP wire protocol (int32-framed
    protobuf Msg, acked). ``ca_cert`` enables the client half of the
    reference's TLS lane (transport/tcp.clj:260-270 — the forwarder
    pair's usual production posture): TLS with the peer's CA pinned,
    hostname verification on. Alert-volume streams only (collects up
    to batch_limit rows per micro-batch on the driver, like the http
    sink); raw-volume egress belongs on the kafka sink carrying Msg
    frames."""

    def write(df: DataFrame, batch_id: int) -> None:
        from riemann_spark.sources.servers import (
            client_tls_context,
            send_events_tcp,
        )

        ctx = client_tls_context(ca_cert) if ca_cert is not None else None

        cols = [c for c in ("host", "service", "state", "description",
                            "metric", "tags", "time", "ttl") if c in df.columns]
        rows = df.select(*cols).limit(batch_limit).collect()
        events = [
            {k: v for k, v in row.asDict().items() if v is not None} for row in rows
        ]
        if events:
            ack = send_events_tcp(port, events, host=host, tls_context=ctx)
            if not ack.get("ok"):
                raise RuntimeError(f"riemann forward rejected: {ack.get('error')}")

    return write
