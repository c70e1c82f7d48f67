"""Deterministic nested ``bidreq`` fixture derived from the driver's
``events`` table.

The reference's only input is a stream of protobuf ``Bidrequest``
messages (/root/reference/proto/bidrequest.proto).  The driver's
correctness harness can only oracle-check queries whose inputs DuckDB
can also see, so the nested fixture is defined as a *pure arithmetic*
function of ``events`` columns (event_id, user_id, ts) — no RNG, no
wall clock (FIXTURES.md §5).  Spark builds the nested structs with
DataFrame expressions; the DuckDB oracle reproduces the *flattened*
consequences of the same arithmetic directly, so both engines agree
bit-for-bit.

Since round 2 the builder covers the FULL 22-message width (see
fullwidth.py, derived from proto/wire.py's field specs).  The legacy
derivation the round-1 oracles depend on is unchanged (e = event_id,
u = user_id):
  seconds     = floor epoch seconds of ts
  nanos       = (e * 1000003) % 1_000_000_000
  event_tm    = epoch millis of ts
  user.id     = ''                 if e % 2 = 0  else 'u' || u          (~50% empty)
  site.id     = ''                 if e % 5 = 0  else 's' || (e % 100)  (~20% empty)
  device.ifa  = ''                 if e % 10 < 3 else 'd' || (e % 1000) (~30% empty)
  pub.id      = 'pub' || (u % 20)
  banner      present iff e % 10 < 7:  w = 300 + (e%5)*10, h = 250 + (e%3)*50
  video       present iff banner absent: w = 640 + (e%5)*16, h = 480 + (e%3)*60
  n_deals     = 0 if e % 5 < 3 else 1 + (e % 4)                         (~60% zero)
  deal[i].id  = 'deal-' || e || '-' || i     (i = 1..n_deals)
  imp has a 2nd bystander element when e % 3 = 0 (exercises pruning;
  the reference only ever touches imp[0], main.go:352-380).
Every other proto field is generated from its path (fullwidth._slot)
with ~25% message presence and 0-2 element repeats; floats are exact
quarters so float32 round-trips are engine-stable.

Rows with e % 10 == 0 have user.id = site.id = ifa = '' (>=1% all-empty
per FIXTURES.md §1).
"""

from __future__ import annotations

from .fullwidth import build_bidreq_full as build_bidreq  # noqa: F401

# --- DuckDB oracle counterpart -------------------------------------------
#
# ``BIDREQ_BASE_CTE`` reproduces the *scalar* consequences of the same
# arithmetic (per-bidrequest grain); ``BIDREQ_NORM_CTE`` additionally
# outer-explodes the deals (per-deal grain, NULL row when no deals —
# exactly U1's semantics, main.go:362-380).  Oracle SQL strings for
# individual operators are composed from these in __spark_entry__.py.
# The full-width flat export's oracle is generated in fullwidth.py.

BIDREQ_BASE_CTE = """
bidreq_base AS (
  SELECT
    'req-' || event_id                            AS bidreq_id,
    epoch_ms(ts) // 1000                          AS seconds,
    (event_id * 1000003) % 1000000000             AS nanos,
    epoch_ms(ts)                                  AS event_tm,
    CASE WHEN event_id % 2 = 0 THEN '' ELSE 'u' || user_id END            AS user_id_s,
    CASE WHEN event_id % 5 = 0 THEN '' ELSE 's' || (event_id % 100) END   AS site_id_s,
    CASE WHEN event_id % 10 < 3 THEN '' ELSE 'd' || (event_id % 1000) END AS ifa_s,
    'pub' || (user_id % 20)                       AS pub_id,
    CASE WHEN event_id % 10 < 7
         THEN CAST(300 + (event_id % 5) * 10 AS INTEGER)
         ELSE CAST(640 + (event_id % 5) * 16 AS INTEGER) END AS width,
    CASE WHEN event_id % 10 < 7
         THEN CAST(250 + (event_id % 3) * 50 AS INTEGER)
         ELSE CAST(480 + (event_id % 3) * 60 AS INTEGER) END AS height,
    CASE WHEN event_id % 5 < 3 THEN 0 ELSE 1 + (event_id % 4) END AS n_deals,
    event_id                                      AS e
  FROM events
)
"""

BIDREQ_NORM_CTE = BIDREQ_BASE_CTE + """,
bidreq_norm AS (
  SELECT
    b.bidreq_id,
    coalesce(nullif(b.user_id_s, ''), nullif(b.site_id_s, ''), nullif(b.ifa_s, '')) AS device_id,
    b.pub_id,
    b.seconds + (b.nanos // 1000000000)           AS event_time,
    b.width,
    b.height,
    CASE WHEN d.i IS NULL THEN NULL
         ELSE 'deal-' || b.e || '-' || d.i END    AS deal
  FROM bidreq_base b
  LEFT JOIN LATERAL (SELECT unnest(generate_series(1, b.n_deals)) AS i) d ON true
)
"""
