"""Exact distributed quantiles over UNBOUNDED float columns.

The relational family's exact quantiles (`pipelines/relational.py:
_event_cent_hist`) ride a fixed-point histogram and are exact only when
the value domain is bounded (2-decimal money). This stage removes that
restriction: iterative histogram refinement — the multi-pass bracketing
scheme — computes EXACT order statistics for arbitrary float64 columns:

  pass 0   one scan → (count, min, max) fixed-size partials
  pass i   one scan → per-bracket ``bins``-bin histogram partials
           (each batch emits ONE fixed-size count vector per bracket;
           the driver sums them — commutative, so order-invariant);
           each target rank's bracket narrows to the single bin that
           contains it, a factor-``bins`` reduction per pass
  final    when a bracket's population ≤ ``gather_limit``: gather just
           those values, sort, index — the order statistic is EXACT

Total passes to reach the gather bound: ceil(log_bins(n / gather_limit))
— a 10^12-row column with bins=2048 and gather_limit=64k needs 3
histogram passes. Every exchange is fixed-size (brackets × bins
(count, min, max) rows per batch); the only data-dependent transfer is
the final gather, bounded by ``gather_limit`` per rank. Each pass snaps
the narrowed bracket to the ACTUAL value extent of the chosen bin, so a
point mass (a single repeated value carrying more than ``gather_limit``
rows) resolves exactly the moment a bin holds one distinct value — no
pass limit is ever hit on real data, and hitting it raises loudly
rather than returning an estimate.

Determinism: histogram sums are order-invariant, bracket updates are
pure functions of the summed counts, and the final gather sorts — two
runs at any parallelism return bit-identical results. Nulls and NaNs
are ignored (DuckDB ``quantile_cont`` semantics); interpolation uses the
``lo*(1-δ) + hi*δ`` lerp form that matches DuckDB bit-for-bit on DOUBLE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scan_stats(ds, col: str) -> tuple[int, float, float]:
    """(n, min, max) over non-null, non-NaN values — one scan, one
    fixed-size row per batch, streamed driver merge."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            return pa.table(
                {
                    "n": pa.array([len(v)], pa.int64()),
                    "lo": pa.array([float(v.min())], pa.float64()),
                    "hi": pa.array([float(v.max())], pa.float64()),
                }
            )
        return pa.table(
            {
                "n": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
            }
        )

    n, gmin, gmax = 0, np.inf, -np.inf
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(b):
            n += int(np.sum(b.column("n").to_numpy()))
            gmin = min(gmin, float(np.min(b.column("lo").to_numpy())))
            gmax = max(gmax, float(np.max(b.column("hi").to_numpy())))
    return n, gmin, gmax


def _hist_pass(ds, col: str, brackets: list[tuple[float, float]], bins: int):
    """One scan: per-bracket ``bins``-bin (count, value-min, value-max)
    vectors, merged on the driver (streamed). Histogram boundary rule is
    np.histogram's: bin j holds e_j <= v < e_{j+1}, last bin includes
    v == e_bins. The per-bin min/max of the ACTUAL values lets the
    caller snap a narrowed bracket to the data extent — a point mass
    (min == max) resolves exactly on the next update instead of
    shrinking the float interval one factor-of-``bins`` at a time."""
    edges = [np.linspace(a, b, bins + 1) for a, b in brackets]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        counts, mins, maxs = [], [], []
        for e in edges:
            inb = v[(v >= e[0]) & (v <= e[-1])]
            idx = np.clip(
                np.searchsorted(e, inb, side="right") - 1, 0, bins - 1
            )
            c = np.bincount(idx, minlength=bins).astype(np.int64)
            mn = np.full(bins, np.inf)
            mx = np.full(bins, -np.inf)
            if len(inb):
                np.minimum.at(mn, idx, inb)
                np.maximum.at(mx, idx, inb)
            counts.append(c)
            mins.append(mn)
            maxs.append(mx)
        return pa.table(
            {
                "bracket": pa.array(range(len(edges)), pa.int64()),
                "counts": pa.array([c.tolist() for c in counts], pa.list_(pa.int64())),
                "mins": pa.array([m.tolist() for m in mins], pa.list_(pa.float64())),
                "maxs": pa.array([m.tolist() for m in maxs], pa.list_(pa.float64())),
            }
        )

    totals = [np.zeros(bins, dtype=np.int64) for _ in brackets]
    vmins = [np.full(bins, np.inf) for _ in brackets]
    vmaxs = [np.full(bins, -np.inf) for _ in brackets]
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        idx = b.column("bracket").to_numpy()
        cmats = b.column("counts").to_pylist()
        mmins = b.column("mins").to_pylist()
        mmaxs = b.column("maxs").to_pylist()
        for i, crow, mnrow, mxrow in zip(idx, cmats, mmins, mmaxs):
            totals[int(i)] += np.asarray(crow, dtype=np.int64)
            np.minimum(vmins[int(i)], np.asarray(mnrow), out=vmins[int(i)])
            np.maximum(vmaxs[int(i)], np.asarray(mxrow), out=vmaxs[int(i)])
    return totals, vmins, vmaxs


def _gather_sorted(ds, col: str, lo: float, hi: float) -> np.ndarray:
    """All values in [lo, hi] (inclusive both ends — values equal to
    ``hi`` that belong to the next bin sort after every in-bracket value
    and cannot disturb an in-bracket rank), ascending."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        v = v[(v >= lo) & (v <= hi)]
        return pa.table({"v": pa.array(v, pa.float64())})

    out = []
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = b.column("v").to_numpy()
        if len(arr):
            out.append(arr)
    vals = np.concatenate(out) if out else np.empty(0, np.float64)
    vals.sort(kind="stable")
    return vals


def exact_float_quantiles(
    ds,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 2048,
    gather_limit: int = 65536,
    max_passes: int = 8,
) -> dict[float, float]:
    """{q: value} — exact ``quantile_cont`` of ``ds[col]`` for each q in
    ``qs``, by iterative histogram refinement (module docstring).

    ``ds`` is re-executed once per pass (2 + ceil(log_bins(n /
    gather_limit)) scans total) — pass a pruned-column read so each scan
    moves only this column. Raises on an empty column (no rows after
    null/NaN removal), on q outside [0, 1], and if ``max_passes``
    refinements fail to reach ``gather_limit`` (cannot happen for real
    float data: a bracket either shrinks by ``bins``× or collapses to a
    point mass, which resolves exactly)."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    n, gmin, gmax = _scan_stats(ds, col)
    if n == 0:
        raise ValueError(f"column {col!r} has no non-null, non-NaN values")

    # 0-based order statistics each q needs (floor/ceil of its position)
    positions = {q: (n - 1) * q for q in qs}
    ranks = sorted(
        {int(np.floor(p)) for p in positions.values()}
        | {int(np.ceil(p)) for p in positions.values()}
    )
    # rank -> (bracket_lo, bracket_hi, n_below_bracket, n_in_bracket)
    state = {k: (gmin, gmax, 0, n) for k in ranks}
    resolved: dict[int, float] = {}
    if gmin == gmax:
        resolved = {k: gmin for k in ranks}
        state = {}

    for _ in range(max_passes):
        pending = {
            k: s for k, s in state.items()
            if k not in resolved and s[3] > gather_limit
        }
        if not pending:
            break
        # dedup shared brackets so the scan histograms each range once
        distinct = sorted({(s[0], s[1]) for s in pending.values()})
        which = {br: i for i, br in enumerate(distinct)}
        totals, vmins, vmaxs = _hist_pass(ds, col, distinct, bins)
        for k, (a, b, below, _) in pending.items():
            i = which[(a, b)]
            c = totals[i]
            cum = np.cumsum(c)
            r = k - below  # rank within the bracket
            j = int(np.searchsorted(cum, r + 1))
            # snap to the ACTUAL value extent of bin j: a point mass
            # resolves right here instead of via float-interval decay
            new_a, new_b = float(vmins[i][j]), float(vmaxs[i][j])
            new_below = below + (int(cum[j - 1]) if j else 0)
            if new_a == new_b:  # single distinct value in the bin
                resolved[k] = new_a
                state.pop(k, None)
            else:
                state[k] = (new_a, new_b, new_below, int(c[j]))
    else:
        still = {k: s for k, s in state.items() if k not in resolved and s[3] > gather_limit}
        if still:
            raise RuntimeError(
                f"quantile refinement did not reach gather_limit after "
                f"{max_passes} passes for ranks {sorted(still)}"
            )

    # final exact gathers — one per distinct remaining bracket
    remaining = [k for k in ranks if k not in resolved]
    for a, b in sorted({(state[k][0], state[k][1]) for k in remaining}):
        vals = _gather_sorted(ds, col, a, b)
        for k in remaining:
            ka, kb, below, _ = state[k]
            if (ka, kb) == (a, b):
                resolved[k] = float(vals[k - below])

    out: dict[float, float] = {}
    for q, p in positions.items():
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        delta = p - lo
        out[q] = resolved[lo] * (1 - delta) + resolved[hi] * delta
    return out
