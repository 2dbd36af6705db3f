"""The collector daemon, assembled: reference config file -> UDP
socket -> wire decode -> per-plugin channels -> sinks.

This is the nfacctd top loop (reference src/nfacctd.c: socket setup
:1525, version dispatch :1649, plugin fan-out src/plugin_hooks.c)
re-expressed as Structured Streaming over the engine's own pieces:

    conffile.parse_conf()  ->  channels (PluginConfig each)
    UdpSpool(port)         ->  datagram stream (the recvfrom loop)
    decode_any             ->  flow records (v5/v9/IPFIX dispatch)
    canonical_flows        ->  the registry's column vocabulary
    stream_aggregation     ->  one windowed aggregation per plugin
    sinks                  ->  memory (IMT) / print (csv/json/avro)

``run_available`` drains everything received so far and stops (the
pcap-replay harness shape); a live deployment starts the same queries
with a processing-time trigger instead. One daemon == one collector
edge node; scale-out is N daemons spooling to shared storage with the
cluster running the same channel queries over the union.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pmacct_spark import conffile
from pmacct_spark.functions.addr import ipv4_ntoa
from pmacct_spark.sources.udp import UdpSpool


def canonical_flows(decoded: DataFrame) -> DataFrame:
    """Map decoded wire records (FLOW_SCHEMA) to the registry's column
    vocabulary, exactly as the reference's handler chain renders
    primitives from the raw record (src/pkt_handlers.c)."""
    return (
        decoded.withColumn("ip_src", ipv4_ntoa("ip_src_i"))
        .withColumn("ip_dst", ipv4_ntoa("ip_dst_i"))
        .withColumn("peer_ip_src", F.col("exporter_ip"))
        .withColumn(
            "ts", F.timestamp_millis(F.col("ts_ms")).cast("timestamp_ntz")
        )
        .withColumn(
            "end_ts",
            F.timestamp_millis(F.col("end_ts_ms")).cast("timestamp_ntz"),
        )
        .withColumn("flows", F.lit(1).cast("long"))
    )


@dataclass
class Daemon:
    """A running collector: the socket spool plus one streaming (or
    replay) aggregation per configured plugin."""

    spark: SparkSession
    conf: conffile.Conf
    spool: UdpSpool
    channels: dict = field(default_factory=dict)  # name -> PluginConfig

    @classmethod
    def from_conf(
        cls,
        spark: SparkSession,
        conf_text: str,
        host: str = "127.0.0.1",
        spool_dir: str | None = None,
    ) -> "Daemon":
        conf = conffile.parse_conf(conf_text)
        port = int(conf.get("nfacctd_port", 0) or 0)
        spool = UdpSpool(
            host=host, port=port, spool_dir=spool_dir, flush_secs=0.2
        ).start()
        return cls(
            spark=spark, conf=conf, spool=spool,
            channels=conffile.channels(conf),
        )

    @property
    def port(self) -> int:
        return self.spool.port

    def stop(self) -> None:
        self.spool.stop()

    def _decoded(self, streaming: bool) -> DataFrame:
        from pmacct_spark.streaming.decode import decode_any

        dg = (
            self.spool.stream(self.spark)
            if streaming
            else self.spool.batch(self.spark)
        )
        return canonical_flows(decode_any(dg.select("exporter_ip", "payload")))

    def run_available(self, streaming: bool = True) -> dict[str, DataFrame]:
        """Process everything received so far through EVERY configured
        plugin channel (availableNow semantics) and deliver to each
        plugin's sink. Returns {plugin_name: result DataFrame}."""
        from pmacct_spark.pipeline import build_aggregation
        from pmacct_spark.sinks.files import write_print
        from pmacct_spark.streaming.jobs import (
            run_to_memory,
            stream_aggregation,
        )

        results: dict[str, DataFrame] = {}
        ptype_by_name = dict(
            (name, ptype) for ptype, name in self.conf.plugins
        ) or {"default": "memory"}
        for name, cfg in self.channels.items():
            if streaming and cfg.history and not cfg.history_spec().calendar:
                agg = stream_aggregation(self._decoded(True), cfg)
                out = run_to_memory(agg, f"imt_{name}")
            else:
                out = build_aggregation(self._decoded(False), cfg)
            ptype = ptype_by_name.get(name, "memory")
            if ptype == "print":
                path = self.conf.get("print_output_file", name)
                fmt = self.conf.get("print_output", name, "csv")
                if path:
                    write_print(out, path, fmt=fmt)
            results[name] = out
        return results


def main(argv: list[str] | None = None) -> int:
    """``python -m pmacct_spark.daemon -f nfacctd.conf`` — collect for
    ``--collect-secs`` then drain every channel to its sink (the
    bounded-replay harness; a service deployment would start the same
    queries with a processing-time trigger instead)."""
    import argparse
    import time as _t

    ap = argparse.ArgumentParser(prog="pmacct_spark.daemon")
    ap.add_argument("-f", "--conf", required=True, help="config file path")
    ap.add_argument("--collect-secs", type=float, default=10.0)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)

    from pmacct_spark.session import get_spark

    spark = get_spark()
    with open(args.conf) as fh:
        d = Daemon.from_conf(spark, fh.read(), host=args.host)
    print(f"listening on {args.host}:{d.port}", flush=True)
    try:
        _t.sleep(args.collect_secs)
        results = d.run_available()
        for name, df in results.items():
            print(f"[{name}] {df.count()} aggregate rows", flush=True)
    finally:
        d.stop()
    return 0


if __name__ == "__main__":  # pragma: no cover - CLI shim
    raise SystemExit(main())
