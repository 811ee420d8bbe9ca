"""Sources (SURVEY.md §2.1): line-protocol parsers and stream readers.

The reference's servers (tcp/udp/ws/graphite/opentsdb/kafka) decode
wire payloads into events. Here decoding is Column work over a text or
Kafka source — identical for batch and streaming DataFrames — and the
"server" part is Spark's source connectors.
"""

from riemann_spark.sources.graphite import graphite_lines_to_events, events_to_graphite_lines
from riemann_spark.sources.opentsdb import opentsdb_lines_to_events
from riemann_spark.sources.json_codec import events_from_json, events_to_json
from riemann_spark.sources.readers import read_events_stream, read_kafka_events, read_socket_lines
from riemann_spark.sources.protobuf import (
    decode_msg,
    encode_msg,
    events_to_msg_binary,
    msg_binary_to_events,
)
from riemann_spark.sources.servers import (
    TcpMsgServer,
    UdpMsgServer,
    query_tcp,
    send_events_tcp,
    send_events_udp,
)
from riemann_spark.sources.sse import SseEventServer
from riemann_spark.sources.prometheus_rw import (
    decode_write_request,
    encode_write_request,
    events_to_remote_write,
    remote_write_to_samples,
    snappy_compress,
    snappy_decompress,
)
from riemann_spark.sources.tsdb_lines import (
    events_to_influx_lines,
    events_to_prometheus_text,
    influx_lines_to_events,
    prometheus_text_to_samples,
)
from riemann_spark.sources.websockets import WsClient, WsEventServer
