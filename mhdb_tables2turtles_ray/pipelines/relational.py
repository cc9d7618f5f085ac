"""Relational operator pipelines over the TPC-H-ish testdata tables.

These exercise the engine's generic operator families — vectorized
map/filter/project, partial+final grouped aggregation, broadcast hash
join, sort/top-k, distinct, ordered in-group enumeration, session
windowing — each in its at-scale shape:

- aggregates pre-combine inside ``map_batches`` (per-batch pyarrow
  ``group_by``) so the shuffle carries one row per key per block;
- dimension joins broadcast the small side via ``ray.put`` (no shuffle);
- floating-point aggregates are rounded at the boundary so results are
  FP-stable across engines (summation order differs between Ray's tree
  of partials and a sequential scan).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.numeric import round_half_away
from ..sources.tables import load_lookup, read_table

# Ceiling for the segment-offset trick's shifted time domain
# (events_sliding_window / purchase_attribution): if
# offset * n_segments would exceed this, the bucket falls back to the
# per-segment loop. Module-level so tests can force the fallback and
# pin branch equality (cloudpickle captures the patched value).
_SHIFT_DOMAIN_MAX = 2**62


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> ray.data.Dataset:
    """TPC-H Q1 shape: filter + partial/final grouped aggregate.

    Output: (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, avg_qty, avg_price, count_order) — monetary sums
    rounded to 2, averages to 6.
    """
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    # Fixed-point aggregation: monetary columns are exact 2-decimal
    # values, so summing integer cents (and cents × discount-units for
    # the product) is EXACT and order-independent — floating-point sums
    # of ~1e9 magnitudes differ across summation orders by more than a
    # cent-rounding boundary (observed at sf0.1), so the oracle match
    # requires integer aggregation, not rounding.
    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), pa.scalar(np.datetime64(cutoff, "us")))
        )
        qty = np.rint(batch.column("l_quantity").to_numpy()).astype(np.int64)
        cents = np.rint(batch.column("l_extendedprice").to_numpy() * 100).astype(
            np.int64
        )
        dunits = np.rint(
            (1.0 - batch.column("l_discount").to_numpy()) * 100
        ).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty),
                "cents": pa.array(cents),
                "disc_fp": pa.array(cents * dunits),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("cents", "sum"), ("disc_fp", "sum"), ("qty", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_sum", alias_name="sum_qty_i"),
        Sum("cents_sum", alias_name="sum_cents"),
        Sum("disc_fp_sum", alias_name="sum_disc_fp"),
        Sum("qty_count", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        qty = batch.column("sum_qty_i").to_numpy().astype(np.float64)
        base = batch.column("sum_cents").to_numpy() / 100.0
        disc = batch.column("sum_disc_fp").to_numpy() / 10000.0
        cnt = batch.column("count_order").to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pa.array(round_half_away(qty, 2)),
                "sum_base_price": pa.array(round_half_away(base, 2)),
                "sum_disc_price": pa.array(round_half_away(disc, 2)),
                "avg_qty": pa.array(round_half_away(qty / cnt, 6)),
                "avg_price": pa.array(round_half_away(base / cnt, 6)),
                "count_order": pa.array(cnt),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast dimension join: orders ⋈ customer ⋈ nation, grouped.

    Output: (n_name, revenue, n_orders). customer/nation are broadcast
    dicts probed per batch — no shuffle join.
    """
    # Broadcast the dimension tables as sorted numpy arrays — the probe
    # is a vectorized searchsorted per batch, not a per-row dict chain.
    cust = load_lookup(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = load_lookup(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    ck = cust.column("c_custkey").to_numpy()
    nk = cust.column("c_nationkey").to_numpy()
    order = np.argsort(ck)
    ck, nk = ck[order], nk[order]
    nnk = nation.column("n_nationkey").to_numpy()
    name_by_key = np.empty(int(nnk.max()) + 1, dtype=object)
    name_by_key[nnk] = np.array(nation.column("n_name").to_pylist(), dtype=object)
    ref = ray.put((ck, nk, name_by_key))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def join_partial(batch: pa.Table) -> pa.Table:
        ck_s, nk_s, names_by_key = ray.get(ref)
        cks = batch.column("o_custkey").to_numpy()
        idx = np.clip(np.searchsorted(ck_s, cks), 0, len(ck_s) - 1)
        hit = ck_s[idx] == cks  # dangling FK → dropped (inner-join)
        names = names_by_key[nk_s[idx[hit]]]
        cents = np.rint(
            batch.column("o_totalprice").to_numpy()[hit] * 100
        ).astype(np.int64)  # fixed-point: exact, order-independent sums
        t = pa.table(
            {"n_name": pa.array(names, pa.string()), "cents": pa.array(cents)}
        )
        return t.group_by(["n_name"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    partials = ds.map_batches(join_partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("n_name").aggregate(
        Sum("cents_sum", alias_name="revenue_cents"),
        Sum("cents_count", alias_name="n_orders"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "revenue": pa.array(
                    round_half_away(
                        batch.column("revenue_cents").to_numpy() / 100.0, 2
                    )
                ),
                "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def topk_orders(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Sort/top-k: k most expensive orders, deterministic tiebreak."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def filter_project_revenue(sf_dir: str, lo: str = "1996-01-01", hi: str = "1997-01-01"):
    """Vectorized filter + computed column over lineitem."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def fp(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        mask = pc.and_(
            pc.greater_equal(sd, pa.scalar(np.datetime64(lo, "us"))),
            pc.less(sd, pa.scalar(np.datetime64(hi, "us"))),
        )
        batch = batch.filter(mask)
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": pc.cast(batch.column("l_linenumber"), pa.int64()),
                "revenue": pa.array(round_half_away(rev.to_numpy(zero_copy_only=False), 2)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def distinct_event_types(sf_dir: str) -> ray.data.Dataset:
    """Distinct scan (tiny shuffle)."""
    ds = read_table(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return ray.data.from_arrow(pa.table({"event_type": pa.array(vals, pa.string())}))


def events_enumerate(sf_dir: str) -> ray.data.Dataset:
    """Per-user ordered enumeration (the ST2 ordinal semantics made
    deterministic): (event_id, user_id, ordinal) ordered by (ts, event_id)."""
    from ..stages.enumerate_groups import enumerate_in_groups

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = enumerate_in_groups(ds, "user_id", ["ts", "event_id"], out_col="ordinal")
    return out.select_columns(["event_id", "user_id", "ordinal"])


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate over the event log: per (hour,
    event_type) count + value sum. Partial per-batch combine (pyarrow
    group_by) → small final shuffle; the window key is computed
    vectorized with ``pc.floor_temporal``."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(np.int64)
        t = pa.table(
            {
                "hour": hour,
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents),  # fixed-point: exact sums
            }
        )
        return t.group_by(["hour", "event_type"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby(["hour", "event_type"]).aggregate(
        Sum("cents_sum", alias_name="value_cents"),
        Sum("cents_count", alias_name="n_events"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": batch.column("hour"),
                "event_type": batch.column("event_type"),
                "sum_value": pa.array(
                    round_half_away(batch.column("value_cents").to_numpy() / 100.0, 2)
                ),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def events_props_extract(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured field extraction: pull the integer ``k`` out of the
    JSON-ish ``props`` column, vectorized with an Arrow regex kernel
    (the portable path — no JSON extension dependency)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        k = pc.extract_regex(batch.column("props"), r'"k": (?P<k>[0-9]+)')
        kvals = pc.struct_field(k, "k")
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "k": pc.cast(kvals, pa.int64()),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)


def _orderkeys_shipped(sf_dir: str, lo: str, hi: str) -> ray.data.Dataset:
    """Dataset of per-batch-distinct shipped orderkeys in the window."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def keys(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        mask = pc.and_(
            pc.greater_equal(sd, pa.scalar(np.datetime64(lo, "us"))),
            pc.less(sd, pa.scalar(np.datetime64(hi, "us"))),
        )
        return (
            batch.filter(mask)
            .select(["l_orderkey"])
            .group_by(["l_orderkey"])
            .aggregate([])
        )

    return ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)


def orders_semi_join(
    sf_dir: str,
    lo: str = "1996-01-01",
    hi: str = "1996-07-01",
    anti: bool = False,
    exact_threshold: int = 4_000_000,
) -> ray.data.Dataset:
    """Semi (or anti) join: orders that do (not) have a lineitem shipped
    in the window — broadcast key-filter, no shuffle on the big side.

    The key filter defaults to the scale-safe side automatically
    (``stages/semijoin.py:build_key_filter``): exact ndarray under
    ``exact_threshold`` distinct keys, distributed Bloom filter above.
    Anti join always forces the exact path — Bloom false positives would
    silently DROP matching rows from an anti join."""
    from ..stages.semijoin import build_key_filter, semi_join

    key_filter = build_key_filter(
        _orderkeys_shipped(sf_dir, lo, hi),
        "l_orderkey",
        exact_threshold=None if anti else exact_threshold,
    )
    ref = ray.put(key_filter)
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return semi_join(ds, "o_orderkey", ref, anti=anti)


def orders_anti_join(sf_dir: str) -> ray.data.Dataset:
    return orders_semi_join(sf_dir, anti=True)


def events_running_total(sf_dir: str) -> ray.data.Dataset:
    """Prefix scan: each user's cumulative event value in (ts, event_id)
    order. Computed as integer cents inside the group (exact,
    order-independent across engines) and divided out at the boundary —
    the same fixed-point discipline as the monetary aggregates.

    Bucket-WIDE vectorization (``sorted_bucket_map``): ONE cumsum over
    the (user, ts, event_id)-sorted bucket, then each row subtracts the
    cumsum value just before its user's segment start — every user's
    prefix scan in three whole-column operations, no per-user loop."""
    from ..stages.grouped import sorted_bucket_map

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def scan_bucket(part: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(part["value"].to_numpy() * 100).astype(np.int64)
        cum = np.cumsum(cents)
        user = part["user_id"].to_numpy()
        if len(user):
            seg = np.cumsum(
                np.concatenate([[0], (user[1:] != user[:-1]).astype(np.int64)])
            )
            starts = np.concatenate(
                [[0], np.flatnonzero(user[1:] != user[:-1]) + 1]
            )
            # cumsum just before each segment's first row (0 for the first)
            base = np.concatenate([[0], cum[starts[1:] - 1]])
            running = cum - base[seg]
        else:
            running = cum
        return pd.DataFrame(
            {
                "event_id": part["event_id"].to_numpy(),
                "user_id": user,
                "running_value": round_half_away(running / 100.0, 2),
            }
        )

    return sorted_bucket_map(ds, "user_id", ["ts", "event_id"], scan_bucket)


def events_pivot_by_type(sf_dir: str) -> ray.data.Dataset:
    """Pivot: one row per user, one count column per event type (the
    fixed public type set). Partial per-batch conditional counts →
    small final sum — the wide-table shape without any per-type pass."""
    from ray.data.aggregate import Sum

    types = ("click", "view", "purchase", "signup", "error")
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")]
        )
        users = t.column("user_id")
        et = t.column("event_type").to_pylist()
        n = t.column("event_type_count").to_numpy()
        cols = {"user_id": users}
        for ty in types:
            mask = np.array([e == ty for e in et])
            cols[f"n_{ty}"] = pa.array(np.where(mask, n, 0).astype(np.int64))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    final = partials.groupby("user_id").aggregate(
        *[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types]
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"user_id": batch.column("user_id")}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(batch.column(f"n_{ty}"), pa.int64())
        return pa.table(cols)

    return final.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def topk_orders_per_customer(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Grouped top-k: each customer's k most expensive orders with their
    in-group rank (deterministic tiebreak on orderkey). Rides the
    coarse-bucketed grouped map — the shuffle moves one task per hash
    bucket, and each fine group sorts only its own rows (never a global
    sort).

    Bucket-WIDE vectorization (``sorted_bucket_map``): a negated-price
    column added in the stateless map stage turns the descending sort
    into the helper's ascending (custkey, -price, orderkey) order
    (float negation is exact, so ties break identically); every
    customer's top-k is then ONE ``cumcount() < k`` mask over the
    bucket."""
    from ..stages.grouped import sorted_bucket_map

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def add_neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__neg_price", pc.negate(batch.column("o_totalprice"))
        )

    def topk_bucket(part: pd.DataFrame) -> pd.DataFrame:
        rank = part.groupby("o_custkey", sort=False).cumcount()
        keep = rank < k
        out = part.loc[keep, ["o_custkey", "o_orderkey", "o_totalprice"]].copy(
            deep=False
        )
        out["rank"] = (rank[keep] + 1).astype(np.int64)
        return out

    return sorted_bucket_map(
        ds.map_batches(add_neg, batch_format="pyarrow", zero_copy_batch=True),
        "o_custkey",
        ["__neg_price", "o_orderkey"],
        topk_bucket,
    )


def _event_cent_hist(sf_dir: str) -> ray.data.Dataset:
    """(event_type, cents, n) — the mergeable fixed-point histogram the
    quantile family shares: each batch emits (type, cents, count)
    partials, the groupby merges them; the shuffle carries histogram
    rows bounded by the VALUE DOMAIN, never the corpus."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(np.int64)
        t = pa.table(
            {"event_type": batch.column("event_type"), "cents": pa.array(cents)}
        )
        return t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cents_count", alias_name="n"))
    )


def value_median_by_type(sf_dir: str) -> ray.data.Dataset:
    """(event_type, median_value) — EXACT per-group median via the
    shared cent histogram (:func:`_event_cent_hist`); the median is read
    off the cumulative histogram as the two middle order statistics —
    identical to numpy's interpolated median / DuckDB ``median``
    (quantile_cont 0.5), and no task ever holds a whole group's raw
    values (the former ``groupby(event_type).map_groups`` held ~20% of
    the corpus per task at 5 event types)."""
    hist = _event_cent_hist(sf_dir)

    def med(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        counts = g["n"].to_numpy(dtype=np.int64)
        vals = g["cents"].to_numpy(dtype=np.float64) / 100.0
        cum = np.cumsum(counts)
        n = int(cum[-1])
        # 0-based order statistics (n-1)//2 and n//2: first bucket whose
        # cumulative count covers each index
        a = vals[np.searchsorted(cum, (n - 1) // 2 + 1)]
        b = vals[np.searchsorted(cum, n // 2 + 1)]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "median_value": [(a + b) / 2.0],
            }
        )

    # the merged histogram is tiny (types × distinct cent values) — the
    # final per-type walk is a driver-scale groupby over histogram rows
    return hist.groupby("event_type").map_groups(med, batch_format="pandas")


def value_quantiles_by_type(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> ray.data.Dataset:
    """(event_type, p50, p90, p99) — EXACT grouped quantiles via the
    same mergeable cent histogram as :func:`value_median_by_type`
    (per-batch (type, cents, count) partials; shuffle bounded by the
    value domain). Interpolation replicates DuckDB ``quantile_cont``
    bit-for-bit on DOUBLE input: ``lo*(1-δ) + hi*δ`` (the lerp form —
    verified against DuckDB; the ``lo + δ*(hi-lo)`` form differs in the
    last ulp)."""
    hist = _event_cent_hist(sf_dir)

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        counts = g["n"].to_numpy(dtype=np.int64)
        vals = g["cents"].to_numpy(dtype=np.float64) / 100.0
        cum = np.cumsum(counts)
        n = int(cum[-1])
        out = {"event_type": [g["event_type"].iloc[0]]}
        for q in qs:
            pos = (n - 1) * q
            lo = int(np.floor(pos))
            hi = int(np.ceil(pos))
            delta = pos - lo
            a = vals[np.searchsorted(cum, lo + 1)]
            b = vals[np.searchsorted(cum, hi + 1)]
            out[f"p{round(q * 100)}"] = [a * (1 - delta) + b * delta]
        return pd.DataFrame(out)

    return hist.groupby("event_type").map_groups(quant, batch_format="pandas")


def distinct_users_by_type(sf_dir: str) -> ray.data.Dataset:
    """(event_type, n_users) — exact distinct count per group, the
    two-level shape: per-batch distinct (type, user) pairs pre-shrink
    the shuffle, the pair groupby dedups globally, then a tiny count
    per type."""
    from ray.data.aggregate import Count

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    distinct_pairs = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="__c"))
    )
    final = distinct_pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("n_users"),
            "n_users",
            pc.cast(batch.column("n_users"), pa.int64()),
        )

    return final.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["event_type", "n_users"])


def order_customer_join(sf_dir: str) -> ray.data.Dataset:
    """Both-sides-big shuffle hash join (stages/shuffle_join.py):
    orders ⋈ customer on custkey → (o_orderkey, o_totalprice, c_name).
    The shape for when neither side fits a broadcast — one all-to-all,
    coarse hash buckets, pandas merge inside each bucket task."""
    from ..stages.shuffle_join import hash_join

    def rename(col_from: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                ["custkey" if c == col_from else c for c in t.schema.names]
            )

        return fn

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(rename("o_custkey"), batch_format="pyarrow", zero_copy_batch=True)
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        rename("c_custkey"), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(
        orders,
        cust,
        on="custkey",
        left_cols=["o_orderkey", "o_totalprice"],
        right_cols=["c_name"],
    )
    return joined.select_columns(["o_orderkey", "o_totalprice", "c_name"])


def asof_last_purchase(sf_dir: str) -> ray.data.Dataset:
    """As-of join (self, per key): for every event, the event_id of the
    most recent purchase by the same user at-or-before it in the
    deterministic (ts, event_id) order. Coarse-bucketed grouped map
    (``stages/grouped.py`` — one task per hash bucket, not per user) +
    in-group ordered forward-fill.

    The ffill column stays float64 (NaN = no prior purchase) through the
    pandas stage and is cast NaN→null→int64 in a trailing pyarrow stage:
    pandas' nullable ``Int64`` extension dtype does not round-trip to
    Arrow ``int64`` through the block layer (observed: schema reports the
    column type as None and the materialized hash diverges).

    Bucket-WIDE vectorization (``sorted_bucket_map``): the whole bucket
    is sorted once by (user, ts, event_id) and the forward fill runs as
    ONE grouped Cython ffill over the bucket — no per-user Python loop
    (the per-fine-group object overhead dominated the old shape)."""
    from ..stages.grouped import sorted_bucket_map

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def asof_bucket(part: pd.DataFrame) -> pd.DataFrame:
        marker = part["event_id"].where(part["event_type"] == "purchase")
        filled = marker.groupby(part["user_id"], sort=False).ffill()
        part = part.assign(last_purchase_event_id=filled)
        return part[["event_id", "user_id", "last_purchase_event_id"]]

    out = sorted_bucket_map(ds, "user_id", ["ts", "event_id"], asof_bucket)

    def cast_out(t: pa.Table) -> pa.Table:
        col = t.column("last_purchase_event_id")
        if pa.types.is_floating(col.type):
            col = pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
        return t.set_column(
            t.schema.get_field_index("last_purchase_event_id"),
            "last_purchase_event_id",
            pc.cast(col, pa.int64()),
        )

    return out.map_batches(cast_out, batch_format="pyarrow", zero_copy_batch=True)


def approx_distinct_users(sf_dir: str, p: int = 12) -> ray.data.Dataset:
    """HyperLogLog approximate distinct user count (mergeable per-batch
    sketches) next to the exact count — rows-only query; accuracy is
    asserted in unit tests (±2% at p=12 for this cardinality)."""
    from ..stages.grouped import bucketed_agg
    from ..stages.sketch import approx_distinct

    ds = read_table(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=p)
    # exact comparison column via the two-level distinct shape (per-batch
    # distinct pre-shrink → coarse-bucketed dedup → row count): the
    # driver sees one integer, never a unique() of an unbounded column,
    # and the shuffle sorts 256 bucket values, not the user-id domain.
    def pre(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["user_id"]).aggregate([])
        return t.append_column(
            "__one", pa.array(np.ones(t.num_rows, np.int64), pa.int64())
        )

    exact = bucketed_agg(
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        "__one",
        how="min",
    ).count()
    return ray.data.from_arrow(
        pa.table(
            {
                "approx_distinct": pa.array([round(est)], pa.int64()),
                "exact_distinct": pa.array([exact], pa.int64()),
            }
        )
    )


def events_sliding_window(
    sf_dir: str, window_seconds: int = 1800
) -> ray.data.Dataset:
    """Sliding-window aggregate (the tumbling window's sibling,
    ``events_hourly``): for every event, the count of the same user's
    events in the trailing ``window_seconds`` (inclusive of ts-peers on
    both ends — RANGE-window semantics, so the result is deterministic
    without a tiebreak).

    Bucket-WIDE vectorization: users' timestamp runs are made globally
    monotone by adding ``segment_index * OFFSET`` (OFFSET > bucket ts
    span + window), so ONE pair of searchsorted calls over the whole
    bucket answers every user — probes can never cross a segment
    boundary because segments are OFFSET apart. Falls back to the
    per-group loop if the shifted domain would overflow int64 (absurd
    spans only; the guard is explicit, not probabilistic)."""
    from ..stages.grouped import grouped_map, sorted_bucket_map

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    win_us = window_seconds * 1_000_000

    def window_bucket(part: pd.DataFrame) -> pd.DataFrame:
        ts = part["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        user = part["user_id"].to_numpy()
        if len(ts):
            seg = np.cumsum(
                np.concatenate([[0], (user[1:] != user[:-1]).astype(np.int64)])
            )
            span = int(ts.max()) - int(ts.min())
            offset = span + win_us + 1
            if offset * (int(seg[-1]) + 1) < _SHIFT_DOMAIN_MAX:  # overflow guard
                adj = ts + seg * offset
                lo = np.searchsorted(adj, adj - win_us, side="left")
                hi = np.searchsorted(adj, adj, side="right")
            else:  # per-segment fallback (vanishingly rare spans)
                lo = np.empty(len(ts), np.int64)
                hi = np.empty(len(ts), np.int64)
                starts = np.concatenate(
                    [[0], np.flatnonzero(user[1:] != user[:-1]) + 1, [len(ts)]]
                )
                for a, b in zip(starts[:-1], starts[1:]):
                    seg_ts = ts[a:b]
                    lo[a:b] = a + np.searchsorted(
                        seg_ts, seg_ts - win_us, side="left"
                    )
                    hi[a:b] = a + np.searchsorted(seg_ts, seg_ts, side="right")
        else:
            lo = hi = np.empty(0, np.int64)
        part = part.copy(deep=False)
        part["n_trailing"] = (hi - lo).astype(np.int64)
        return part[["event_id", "user_id", "n_trailing"]]

    return sorted_bucket_map(ds, "user_id", ["ts", "event_id"], window_bucket)


def events_sample_per_user(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Deterministic distributed sampling: the k events per user with
    the smallest md5(event_id) — a seedless, order-independent sample
    that any engine reproduces exactly (md5 is the cross-engine
    'random' key; DuckDB's md5 matches hashlib's hex)."""
    import hashlib as _hl

    from ..stages.grouped import sorted_bucket_map

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def add_hk(batch: pa.Table) -> pa.Table:
        # md5 stays per-row (it IS the cross-engine sample key) but runs
        # in the stateless map stage, off the shuffle's critical path
        hk = [
            _hl.md5(str(e).encode()).hexdigest()
            for e in batch.column("event_id").to_pylist()
        ]
        return batch.append_column("__hk", pa.array(hk, pa.string()))

    def sample_bucket(part: pd.DataFrame) -> pd.DataFrame:
        keep = part.groupby("user_id", sort=False).cumcount() < k
        return part.loc[keep, ["user_id", "event_id"]]

    return sorted_bucket_map(
        ds.map_batches(add_hk, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        ["__hk", "event_id"],
        sample_bucket,
    )


def sessionize(sf_dir: str, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Session windows per user (stream-shaped op on the ordered log):
    a new session starts when the gap from the previous event exceeds
    ``gap_seconds``. Output: (user_id, session_id, n_events,
    first_event_id).

    Bucket-WIDE vectorization (``sorted_bucket_map``): one stable sort
    of the bucket by (user, ts, event_id), then session boundaries are
    a single whole-column expression — a row starts a session iff the
    user changes OR the in-user gap exceeds the timeout — and the
    per-session aggregate is ONE vectorized groupby over the boundary
    counter (the old per-user loop paid pandas object overhead per tiny
    group)."""
    from ..stages.grouped import sorted_bucket_map

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def sessions_bucket(part: pd.DataFrame) -> pd.DataFrame:
        user = part["user_id"]
        new_user = user.ne(user.shift())
        gaps = part["ts"].diff().dt.total_seconds()
        # cross-user diff is garbage but new_user forces those rows True
        boundary = new_user | (gaps > gap_seconds)
        agg = (
            part.assign(__g=boundary.cumsum())
            .groupby("__g", sort=False)
            .agg(
                user_id=("user_id", "first"),
                n_events=("event_id", "size"),
                first_event_id=("event_id", "min"),
            )
            .reset_index(drop=True)
        )
        # rows are in (user, time) order, so the within-user ordinal IS
        # the session id
        agg["session_id"] = (
            agg.groupby("user_id", sort=False).cumcount() + 1
        )
        return agg[["user_id", "session_id", "n_events", "first_event_id"]]

    return sorted_bucket_map(ds, "user_id", ["ts", "event_id"], sessions_bucket)


def purchase_attribution(
    sf_dir: str, window_seconds: int = 86400
) -> ray.data.Dataset:
    """Range (interval) join, the two-relation kind: LEFT side = purchase
    events, RIGHT side = the same user's NON-purchase events with
    ``ts in [purchase.ts - window, purchase.ts)`` — the classic
    attribution join. Output per purchase: (event_id, user_id,
    n_attributed, attributed_cents), zeros when nothing precedes it
    (left-join semantics).

    Distinct from :func:`events_sliding_window` (a single-relation RANGE
    window function): here two different relations are joined on an
    equi-key PLUS an interval predicate. The at-scale shape is the one
    every banded join reduces to — co-partition both sides on the
    equi-key (one coarse-bucketed shuffle, ``stages/grouped.py``), then
    inside each key group sort the right side once and answer every left
    interval with two vectorized ``searchsorted`` probes + a prefix-sum
    difference (no per-pair work, no per-row Python). The monetary sum
    rides integer cents (fixed point) so the result is summation-order
    independent — the same discipline as ``_event_cent_hist``.

    Bucket-WIDE vectorization (``sorted_bucket_map``): the same
    segment-offset trick as :func:`events_sliding_window` — each user's
    rows are shifted by ``segment_index * OFFSET`` (OFFSET > bucket ts
    span + window) so the NON-purchase rows of the whole bucket form one
    globally sorted array and two ``searchsorted`` probes answer every
    purchase at once (a probe can never cross a segment boundary).
    Falls back to a per-segment loop if the shifted domain would
    overflow int64."""
    from ..stages.grouped import sorted_bucket_map

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    win_us = window_seconds * 1_000_000

    def attrib_bucket(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "n_attributed": pd.Series([], dtype=np.int64),
                "attributed_cents": pd.Series([], dtype=np.int64),
            }
        )
        is_p = part["event_type"].eq("purchase").to_numpy()
        if not is_p.any():
            return empty
        ts = part["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        user = part["user_id"].to_numpy()
        seg = np.cumsum(
            np.concatenate([[0], (user[1:] != user[:-1]).astype(np.int64)])
        )
        # 2-decimal values: *100 never lands on an exact .5, so rint
        # (half-even) == DuckDB round (half-away) here, as in the hist
        cents = np.rint(part["value"].to_numpy() * 100.0).astype(np.int64)
        span = int(ts.max()) - int(ts.min())
        offset = span + win_us + 1
        if offset * (int(seg[-1]) + 1) < _SHIFT_DOMAIN_MAX:  # overflow guard
            adj = ts + seg * offset
            radj = adj[~is_p]
            csum = np.concatenate([[0], np.cumsum(cents[~is_p])])
            padj = adj[is_p]
            lo = np.searchsorted(radj, padj - win_us, side="left")  # >= ts - win
            hi = np.searchsorted(radj, padj, side="left")  # strictly < ts
        else:  # per-segment fallback (vanishingly rare spans)
            n_p = int(is_p.sum())
            lo = np.empty(n_p, np.int64)
            hi = np.empty(n_p, np.int64)
            starts = np.concatenate(
                [[0], np.flatnonzero(user[1:] != user[:-1]) + 1, [len(ts)]]
            )
            r_base = 0  # right-side rows already placed before this segment
            p_base = 0  # purchases already answered
            for a, b in zip(starts[:-1], starts[1:]):
                seg_p = is_p[a:b]
                seg_rts = ts[a:b][~seg_p]
                seg_pts = ts[a:b][seg_p]
                k = len(seg_pts)
                lo[p_base : p_base + k] = r_base + np.searchsorted(
                    seg_rts, seg_pts - win_us, side="left"
                )
                hi[p_base : p_base + k] = r_base + np.searchsorted(
                    seg_rts, seg_pts, side="left"
                )
                r_base += len(seg_rts)
                p_base += k
            # rows are in segment order, so the global prefix sum over
            # cents[~is_p] matches the r_base-offset indices
            csum = np.concatenate([[0], np.cumsum(cents[~is_p])])
        return pd.DataFrame(
            {
                "event_id": part["event_id"].to_numpy()[is_p],
                "user_id": user[is_p],
                "n_attributed": (hi - lo).astype(np.int64),
                "attributed_cents": (csum[hi] - csum[lo]).astype(np.int64),
            }
        )

    return sorted_bucket_map(
        ds, "user_id", ["ts", "event_id"], attrib_bucket
    )


def events_rollup(sf_dir: str) -> ray.data.Dataset:
    """ROLLUP (grouping-sets) aggregate: (event_type, day) → count +
    cents sum at THREE levels — (type, day), (type, ALL), (ALL, ALL) —
    with SQL ROLLUP's NULL markers for rolled-up columns.

    The at-scale shape is aggregate REUSE: the raw table is scanned
    exactly once to build the finest level (per-batch pyarrow partials
    → one small shuffle, the ``events_hourly`` pattern); every coarser
    level is then re-aggregated FROM the finest result (|types| × |days|
    rows), so rollup costs one pass regardless of how many levels the
    hierarchy has. The driver only ever sees the single grand-total row.
    ``event_type`` is non-nullable in the data, so the NULL markers are
    unambiguous (the classic ROLLUP caveat does not bite here)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # the day key shuffles as int64 epoch-µs (timestamps as groupby
        # keys round-trip through numpy with a lossy-precision warning);
        # shape_fine casts back to timestamp at the output boundary
        day_us = pc.cast(
            pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()
        )
        cents = np.rint(batch.column("value").to_numpy() * 100).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day_us": day_us,
                "cents": pa.array(cents),
            }
        )
        return t.group_by(["event_type", "day_us"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "day_us"])
        .aggregate(
            Sum("cents_sum", alias_name="cents"),
            Sum("cents_count", alias_name="n"),
        )
    )

    def shape_fine(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.cast(
                    pc.cast(batch.column("day_us"), pa.int64()),
                    pa.timestamp("us"),
                ),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "cents": pc.cast(batch.column("cents"), pa.int64()),
            }
        )

    # materialize the finest level (|types| × |days| rows — an already-
    # aggregated, bounded result) so the three consumers below reuse its
    # blocks instead of each lazily re-running the raw scan
    fine = fine.map_batches(
        shape_fine, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # coarser levels re-aggregate the (tiny) finest level — no rescan
    lvl_type = fine.groupby("event_type").aggregate(
        Sum("cents", alias_name="cents"), Sum("n", alias_name="n")
    )

    def shape_type(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pa.nulls(batch.num_rows, pa.timestamp("us")),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "cents": pc.cast(batch.column("cents"), pa.int64()),
            }
        )

    lvl_type = lvl_type.map_batches(
        shape_type, batch_format="pyarrow", zero_copy_batch=True
    )

    totals = fine.aggregate(
        Sum("cents", alias_name="cents"), Sum("n", alias_name="n")
    )
    grand = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([None], pa.string()),
                "day": pa.array([None], pa.timestamp("us")),
                "n": pa.array([int(totals["n"])], pa.int64()),
                "cents": pa.array([int(totals["cents"])], pa.int64()),
            }
        )
    )
    return fine.union(lvl_type).union(grand)
