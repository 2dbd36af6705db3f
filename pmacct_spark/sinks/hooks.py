"""Purge hooks: the reference's escape hatches around a sink flush —
``sql_trigger_exec`` runs an external program on purge (reference
src/plugin_common.h:169 P_trigger_exec) and ``plugin_cmn_custom``
loads user print callbacks (reference src/plugin_cmn_custom.c).

Spark-first both are ``foreachBatch``: the micro-batch boundary IS the
purge boundary, and the callback receives the batch DataFrame plus the
batch id (the reference passes the window spec via environment)."""

from __future__ import annotations

import subprocess
from collections.abc import Callable

from pyspark.sql import DataFrame


def trigger_exec(
    cmd: list[str],
    env_from_batch: Callable[[DataFrame, int], dict[str, str]] | None = None,
):
    """Build a foreachBatch hook that runs ``cmd`` after each purge,
    with reference-style environment variables describing the batch
    (the reference exports INSERT/UPDATE counts and the time window)."""

    def hook(batch: DataFrame, batch_id: int) -> None:
        env = {"BATCH_ID": str(batch_id)}
        if env_from_batch:
            env.update(env_from_batch(batch, batch_id))
        subprocess.run(cmd, env=env, check=False)

    return hook


def custom_writer(
    write_fn: Callable[[DataFrame, int], None],
    then: Callable[[DataFrame, int], None] | None = None,
):
    """Compose a user write callback (the custom-output-writer plugin)
    with an optional post-purge trigger into one foreachBatch hook."""

    def hook(batch: DataFrame, batch_id: int) -> None:
        write_fn(batch, batch_id)
        if then:
            then(batch, batch_id)

    return hook
