"""Exact distributed quantiles over UNBOUNDED float columns.

The relational family's exact quantiles (`pipelines/relational.py:
_event_cent_hist`) ride a fixed-point histogram and are exact only when
the value domain is bounded (2-decimal money). This stage removes that
restriction: iterative histogram refinement — the multi-pass bracketing
scheme — computes EXACT order statistics for arbitrary float64 columns:

  pass 0   one scan → (count, min, max) fixed-size partials
  pass i   one scan → per-bracket ``bins``-bin histogram partials
           (each batch emits ONE fixed-size (count, min, max) vector
           per bracket; the driver sums/merges them — commutative, so
           order-invariant); each target rank's bracket narrows to the
           single bin that contains it, a factor-``bins`` reduction
           per pass
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

The grouped variant shares the SAME scans across all groups: brackets
are (group, rank)-scoped, so G groups × R ranks refine together in one
pass over the data — never one scan per group. It is deliberately
capped at ``max_groups`` (the per-pass exchange is groups × ranks ×
bins); high-cardinality keys belong to the bounded-domain cent
histogram or ``grouped_map`` family instead.

Determinism: histogram merges are order-invariant, bracket updates are
pure functions of the merged vectors, and the final gather sorts — two
runs at any parallelism return bit-identical results. Nulls and NaNs
are ignored (DuckDB ``quantile_cont`` semantics); interpolation uses the
``lo*(1-δ) + hi*δ`` lerp form that matches DuckDB bit-for-bit on DOUBLE.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _col_and_groups(batch: pa.Table, col: str, key: str | None):
    """(values, group labels | None) with NaN/null value rows — and,
    in the grouped case, NULL-KEY rows (the repo-wide pandas-groupby
    convention) — dropped from BOTH arrays (alignment preserved)."""
    import pyarrow.compute as pc

    v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
    keep = ~np.isnan(v)
    g = None
    if key is not None:
        kcol = batch.column(key)
        keep &= pc.is_valid(kcol).to_numpy(zero_copy_only=False)
        g = kcol.to_numpy(zero_copy_only=False)[keep]
    return v[keep], g


def _scan_stats(ds, col: str, key: str | None, max_groups: int) -> dict:
    """{group: (n, min, max)} over non-null, non-NaN values — one scan,
    fixed-size per-group rows per batch, streamed driver merge. With
    ``key=None`` the single group is ``None``. Raises when the key's
    cardinality exceeds ``max_groups`` (this stage's exchange is
    groups × ranks × bins per pass — a high-cardinality key belongs to
    the cent-histogram / grouped_map family, not here)."""

    def partial(batch: pa.Table) -> pa.Table:
        ktype = pa.string() if key is None else batch.column(key).type
        v, g = _col_and_groups(batch, col, key)
        if not len(v):
            return pa.table(
                {
                    "g": pa.array([], ktype),
                    "n": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                }
            )
        if key is None:
            names = pa.array([""], ktype)
            idx = np.zeros(len(v), dtype=np.int64)
            ngroups = 1
        else:
            gs, idx = np.unique(g, return_inverse=True)
            names = pa.array(gs.tolist(), ktype)
            ngroups = len(gs)
        n = np.bincount(idx, minlength=ngroups).astype(np.int64)
        lo = np.full(ngroups, np.inf)
        hi = np.full(ngroups, -np.inf)
        np.minimum.at(lo, idx, v)
        np.maximum.at(hi, idx, v)
        return pa.table(
            {
                "g": names,
                "n": pa.array(n, pa.int64()),
                "lo": pa.array(lo, pa.float64()),
                "hi": pa.array(hi, pa.float64()),
            }
        )

    stats: dict = {}
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for g, n, lo, hi in zip(
            b.column("g").to_pylist(),
            b.column("n").to_numpy(),
            b.column("lo").to_numpy(),
            b.column("hi").to_numpy(),
        ):
            gk = None if key is None else g
            pn, plo, phi = stats.get(gk, (0, np.inf, -np.inf))
            stats[gk] = (pn + int(n), min(plo, float(lo)), max(phi, float(hi)))
            if len(stats) > max_groups:
                raise ValueError(
                    f"key {key!r} exceeds max_groups={max_groups}; use the "
                    "bounded-domain cent histogram or grouped_map family "
                    "for high-cardinality grouped quantiles"
                )
    return stats


def _slice_groups(v: np.ndarray, glab, groups: list) -> dict:
    """{group: its values} for the distinct groups the brackets need —
    ONE sort-based split per batch, so per-bracket work below touches
    only that group's rows (never a full-batch ``glab == g`` compare
    per bracket, which at the max_groups cap would re-scan every batch
    hundreds of times)."""
    if glab is None or not len(v):
        return {}
    uniq, inv = np.unique(glab, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    sorted_v = v[order]
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    wanted = set(groups)
    return {
        g: sorted_v[bounds[i]:bounds[i + 1]]
        for i, g in enumerate(uniq)
        if g in wanted
    }


def _hist_pass(ds, col: str, key: str | None, brackets: list, bins: int):
    """One scan: per-bracket ``bins``-bin (count, value-min, value-max)
    vectors, merged on the driver (streamed). ``brackets`` entries are
    ``(group, lo, hi)`` — a bracket only counts rows of its group
    (``group is None`` matches every row). Histogram boundary rule is
    np.histogram's: bin j holds e_j <= v < e_{j+1}, last bin includes
    v == e_bins. The per-bin min/max of the ACTUAL values lets the
    caller snap a narrowed bracket to the data extent — a point mass
    (min == max) resolves exactly on the next update instead of
    shrinking the float interval one factor-of-``bins`` at a time."""
    edges = [np.linspace(a, b, bins + 1) for _, a, b in brackets]
    groups = [g for g, _, _ in brackets]

    def partial(batch: pa.Table) -> pa.Table:
        v, glab = _col_and_groups(batch, col, key)
        by_group = _slice_groups(v, glab, groups)
        empty = np.empty(0, np.float64)
        counts, mins, maxs = [], [], []
        for g, e in zip(groups, edges):
            inb = v if g is None else by_group.get(g, empty)
            inb = inb[(inb >= e[0]) & (inb <= e[-1])]
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


def _gather_pass(ds, col: str, key: str | None, brackets: list) -> list:
    """ONE scan collecting EVERY remaining bracket's values at once —
    list of ascending arrays aligned with ``brackets`` entries
    ``(group, lo, hi)``. Each bracket gathers [lo, hi] inclusive both
    ends (values equal to ``hi`` that belong to the next bin sort after
    every in-bracket value and cannot disturb an in-bracket rank).
    Never one dataset execution per bracket — grouped callers may have
    hundreds of brackets left, and each gather is bounded by
    ``gather_limit`` anyway."""
    groups = [g for g, _, _ in brackets]

    def partial(batch: pa.Table) -> pa.Table:
        v, glab = _col_and_groups(batch, col, key)
        by_group = _slice_groups(v, glab, groups)
        empty = np.empty(0, np.float64)
        idx_out, val_out = [], []
        for i, (g, lo, hi) in enumerate(brackets):
            inb = v if g is None else by_group.get(g, empty)
            inb = inb[(inb >= lo) & (inb <= hi)]
            if len(inb):
                idx_out.append(np.full(len(inb), i, dtype=np.int64))
                val_out.append(inb)
        if idx_out:
            return pa.table(
                {
                    "bracket": pa.array(np.concatenate(idx_out), pa.int64()),
                    "v": pa.array(np.concatenate(val_out), pa.float64()),
                }
            )
        return pa.table(
            {
                "bracket": pa.array([], pa.int64()),
                "v": pa.array([], pa.float64()),
            }
        )

    out: list[list[np.ndarray]] = [[] for _ in brackets]
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        idx = b.column("bracket").to_numpy()
        vals = b.column("v").to_numpy()
        for i in np.unique(idx):
            out[int(i)].append(vals[idx == i])
    result = []
    for chunks in out:
        vals = np.concatenate(chunks) if chunks else np.empty(0, np.float64)
        vals.sort(kind="stable")
        result.append(vals)
    return result


def _refine(
    ds,
    col: str,
    key: str | None,
    stats: dict,
    qs: tuple[float, ...],
    bins: int,
    gather_limit: int,
    max_passes: int,
) -> dict:
    """{(group, q): value} — the shared refinement engine. All groups'
    ranks refine in the SAME histogram passes (one scan each)."""
    positions = {
        (g, q): (n - 1) * q for g, (n, _, _) in stats.items() for q in qs
    }
    targets = sorted(
        {
            (g, int(f(p)))
            for (g, _), p in positions.items()
            for f in (np.floor, np.ceil)
        },
        key=lambda t: (repr(t[0]), t[1]),
    )
    # (group, rank) -> (bracket_lo, bracket_hi, n_below, n_in_bracket)
    state = {}
    resolved: dict = {}
    for g, k in targets:
        n, gmin, gmax = stats[g]
        if gmin == gmax:
            resolved[(g, k)] = gmin
        else:
            state[(g, k)] = (gmin, gmax, 0, n)

    for _ in range(max_passes):
        pending = {
            t: s for t, s in state.items()
            if t not in resolved and s[3] > gather_limit
        }
        if not pending:
            break
        # dedup shared brackets so the scan histograms each range once
        distinct = sorted(
            {(t[0], s[0], s[1]) for t, s in pending.items()},
            key=lambda x: (repr(x[0]), x[1], x[2]),
        )
        which = {br: i for i, br in enumerate(distinct)}
        totals, vmins, vmaxs = _hist_pass(ds, col, key, distinct, bins)
        for (g, k), (a, b, below, _) in pending.items():
            i = which[(g, a, b)]
            c = totals[i]
            cum = np.cumsum(c)
            r = k - below  # rank within the bracket
            j = int(np.searchsorted(cum, r + 1))
            # snap to the ACTUAL value extent of bin j: a point mass
            # resolves right here instead of via float-interval decay
            new_a, new_b = float(vmins[i][j]), float(vmaxs[i][j])
            new_below = below + (int(cum[j - 1]) if j else 0)
            if new_a == new_b:  # single distinct value in the bin
                resolved[(g, k)] = new_a
                state.pop((g, k), None)
            else:
                state[(g, k)] = (new_a, new_b, new_below, int(c[j]))
    else:
        still = [
            t for t, s in state.items()
            if t not in resolved and s[3] > gather_limit
        ]
        if still:
            raise RuntimeError(
                f"quantile refinement did not reach gather_limit after "
                f"{max_passes} passes for (group, rank) {sorted(still, key=repr)}"
            )

    # final exact gathers — ALL remaining brackets in ONE scan
    remaining = [t for t in targets if t not in resolved]
    if remaining:
        gathers = sorted(
            {(t[0], state[t][0], state[t][1]) for t in remaining},
            key=lambda x: (repr(x[0]), x[1], x[2]),
        )
        which_g = {br: i for i, br in enumerate(gathers)}
        gathered = _gather_pass(ds, col, key, gathers)
        for t in remaining:
            tg, k = t
            ka, kb, below, _ = state[t]
            resolved[t] = float(gathered[which_g[(tg, ka, kb)]][k - below])

    out: dict = {}
    for (g, q), p in positions.items():
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        if lo == hi:
            # integral rank position: no interpolation — the lerp form
            # would turn an exact ±inf into inf*0 = NaN
            out[(g, q)] = resolved[(g, lo)]
        else:
            delta = p - lo
            out[(g, q)] = (
                resolved[(g, lo)] * (1 - delta) + resolved[(g, hi)] * delta
            )
    return out


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
    refinements fail to reach ``gather_limit``."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    stats = _scan_stats(ds, col, None, max_groups=1)
    if not stats or stats[None][0] == 0:
        raise ValueError(f"column {col!r} has no non-null, non-NaN values")
    res = _refine(ds, col, None, stats, qs, bins, gather_limit, max_passes)
    return {q: res[(None, q)] for q in qs}


def exact_float_quantiles_by_group(
    ds,
    key: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    bins: int = 2048,
    gather_limit: int = 65536,
    max_passes: int = 8,
    max_groups: int = 256,
) -> dict:
    """{group: {q: value}} — exact per-group ``quantile_cont`` of
    ``ds[col]`` grouped by ``ds[key]``, all groups sharing the same
    refinement scans (one histogram pass covers every (group, rank)
    bracket — G groups never cost G scans).

    Bounded by construction: raises when the key has more than
    ``max_groups`` distinct values (the per-pass exchange is groups ×
    ranks × ``bins`` rows; high-cardinality keys belong to the
    cent-histogram / ``grouped_map`` family). Groups whose rows are all
    null/NaN are absent from the result."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    stats = _scan_stats(ds, col, key, max_groups=max_groups)
    stats = {g: s for g, s in stats.items() if s[0] > 0}
    if not stats:
        raise ValueError(f"column {col!r} has no non-null, non-NaN values")
    res = _refine(ds, col, key, stats, qs, bins, gather_limit, max_passes)
    return {g: {q: res[(g, q)] for q in qs} for g in stats}
