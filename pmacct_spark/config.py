"""Plugin/channel configuration — the engine's query description.

Mirrors the reference's per-plugin config surface (CONFIG-KEYS): the
``aggregate`` directive picks the key primitives; ``*_history`` sets the
tumbling time bucket; ``aggregate_filter``/``pre_tag_filter`` route
records into the channel; preprocess thresholds are post-aggregation
HAVING checks (reference src/preprocess.c:92-131).

One ``PluginConfig`` == one pmacct plugin channel == one declarative
DataFrame plan built by :func:`pmacct_spark.pipeline.build_aggregation`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


_HISTORY_RE = re.compile(r"^(\d+)\s*([smhdwM])$")

# seconds per unit for linear (non-calendar) buckets
# (parse_time, reference src/cfg_handlers.c:6733-6791)
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


@dataclass(frozen=True)
class History:
    """A tumbling-window spec: ``N [s|m|h|d|w|M]``.

    Months are calendar buckets (no fixed length) — the reference
    special-cases them (COUNT_MONTHLY, src/pmacct-defines.h:424-429) and
    so do we (date_trunc instead of fixed-width window).
    """

    n: int
    unit: str

    @classmethod
    def parse(cls, spec: str) -> "History":
        m = _HISTORY_RE.match(spec.strip())
        if not m:
            raise ValueError(f"bad history spec {spec!r} (want e.g. '5m', '1h', '1M')")
        return cls(int(m.group(1)), m.group(2))

    @property
    def calendar(self) -> bool:
        return self.unit == "M"

    @property
    def seconds(self) -> int:
        if self.calendar:
            raise ValueError("calendar months have no fixed seconds")
        return self.n * _UNIT_SECONDS[self.unit]


@dataclass
class Preprocess:
    """Post-aggregation checks & actions (reference src/preprocess.h:74-95).

    Checks drop aggregates outside thresholds (a HAVING clause); actions
    rescale survivors.
    """

    minp: int | None = None  # min packets
    minb: int | None = None  # min bytes
    minf: int | None = None  # min flows
    maxp: int | None = None
    maxb: int | None = None
    maxf: int | None = None
    minbpp: int | None = None  # min bytes-per-packet
    minppf: int | None = None  # min packets-per-flow
    maxbpp: int | None = None
    maxppf: int | None = None
    usrf: int | None = None  # uniform renormalization factor (action)
    adjb: int | None = None  # adjust bytes by constant (action)

    def having_sql(self) -> str | None:
        """Render the checks as one boolean SQL expression."""
        conds = []
        for attr, expr in [
            ("minp", "packets >= {v}"),
            ("minb", "bytes >= {v}"),
            ("minf", "flows >= {v}"),
            ("maxp", "packets <= {v}"),
            ("maxb", "bytes <= {v}"),
            ("maxf", "flows <= {v}"),
            # bpp/ppf use integer ratios, as the reference computes them
            # on u64 counters (src/preprocess.c:92-131)
            ("minbpp", "(bytes DIV packets) >= {v}"),
            ("minppf", "(packets DIV flows) >= {v}"),
            ("maxbpp", "(bytes DIV packets) <= {v}"),
            ("maxppf", "(packets DIV flows) <= {v}"),
        ]:
            v = getattr(self, attr)
            if v is not None:
                conds.append(expr.format(v=v))
        return " AND ".join(conds) if conds else None


@dataclass
class PluginConfig:
    """One output channel: what to group by, over which time buckets,
    filtered/thresholded how."""

    aggregate: list[str] = field(default_factory=list)  # key primitives
    counters: list[str] = field(default_factory=lambda: ["bytes", "packets", "flows"])
    history: str | None = None  # e.g. '5m' -> tumbling buckets
    history_roundoff: str | None = None  # m|h|d|w|M align first bucket
    history_offset: int = 0  # shift bucket origin by N seconds
    pro_rating: bool = False  # split counters across spanned buckets
    multi_window: bool = False  # insert whole counters into EVERY spanned bucket
    stitching: bool = False  # add timestamp_min/timestamp_max
    renormalize: bool = False  # counters *= sampling_rate pre-agg
    aggregate_filter: str | None = None  # SQL predicate on the flow schema
    pre_tag_filter: list[int] | None = None  # keep only these tag values
    # label routing (CONFIG-KEYS:2327 pre_tag_label_filter): ordered
    # entries, '-' prefix negates, 'null' matches unlabelled records
    pre_tag_label_filter: list[str] | None = None
    post_tag: int | None = None  # constant tag, overrides pre_tag_map
    post_tag2: int | None = None  # constant tag2, overrides pre_tag_map
    timestamps_secs: bool = False  # truncate timestamp primitives to seconds
    preprocess: Preprocess | None = None
    topn: tuple[str, int] | None = None  # (counter, N) — client -T semantics

    def history_spec(self) -> History | None:
        return History.parse(self.history) if self.history else None
