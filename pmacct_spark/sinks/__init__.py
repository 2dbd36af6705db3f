"""Sinks: file/print output, Kafka record shaping, SQL-style upsert,
tee replication — the reference's plugin outputs re-expressed as
DataFrame writers (reference src/print_plugin.c, src/kafka_plugin.c,
src/sql_common.c, src/tee_plugin/)."""
