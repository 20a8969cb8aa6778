"""The bench artifact's durable-tail contract (round-10 verdict #1): the
driver keeps only the LAST 2000 chars of bench.py's one printed JSON line,
so the complete per-query ratio signal and the summary stats must live at
the END of the line — at the current suite size AND with generous headroom.
These tests exercise bench.build_artifact directly with synthetic timings
(no Spark), so the guard runs in milliseconds on every pytest invocation.
"""

from __future__ import annotations

import json

import pytest

from bench import HEADLINE, build_artifact


def _synthetic(names):
    timings = {n: 1.0 + (i % 7) / 10 for i, n in enumerate(names)}
    base = {n: 1.0 for n in names}
    return timings, base


def _tail_keys(out: dict, keep: int = 2000) -> str:
    # mirrors main()'s print: compact separators (the driver truncates the
    # PRINTED text, so the model must match the wire format)
    line = json.dumps(out, separators=(",", ":"))
    return line[-keep:]


def test_tail_contains_every_ratio_and_summary_at_current_size():
    """For the REAL headline list: every entry's compact ratio, the summary
    stats, and the flag list must all survive the 2000-char tail."""
    timings, base = _synthetic(HEADLINE)
    out, missing = build_artifact(timings, dict(timings), {}, base, "sf")
    assert not missing
    tail = _tail_keys(out)
    for n in HEADLINE:
        prefix = n.split("_", 1)[0]
        assert f'"{prefix}":' in tail, f"ratio for {n} fell out of the tail"
    for key in ("ratio_mean", "ratio_median", "ratio_worst", "flagged_over_2x"):
        assert f'"{key}"' in tail, key


def test_tail_holds_with_headroom_for_growth():
    """The same property at ~150 entries — the documented design budget —
    so suite growth can't silently reintroduce the r10 truncation."""
    names = (
        [f"q{i:02d}_synthetic_relational_entry_name" for i in range(60)]
        + [f"x{i:02d}_synthetic_extension_entry_name" for i in range(60)]
        + [f"s{i:02d}_synthetic_streaming_entry_name" for i in range(30)]
    )
    timings, base = _synthetic(names)
    out, _ = build_artifact(timings, dict(timings), {}, base, "sf", headline=names)
    tail = _tail_keys(out)
    for n in names:
        prefix = n.split("_", 1)[0]
        assert f'"{prefix}":' in tail, f"{n} fell out at 150 entries"
    assert '"flagged_over_2x"' in tail


def test_missing_floor_reported_and_prefix_collision_raises():
    names = ["q01_a", "q02_b", "x01_c"]
    timings, base = _synthetic(names)
    del base["x01_c"]
    out, missing = build_artifact(
        timings, dict(timings), {}, base, "sf", headline=names
    )
    assert missing == ["x01_c"] and out["missing_floor"] == ["x01_c"]

    dup = ["q01_a", "q01_b"]
    timings2, base2 = _synthetic(dup)
    with pytest.raises(RuntimeError, match="prefix collision"):
        build_artifact(timings2, dict(timings2), {}, base2, "sf", headline=dup)


def test_flagged_entries_survive_at_the_very_end():
    """flagged_over_2x (compact prefixes) is the LAST key of the line, so
    a regression's flag always survives the tail regardless of suite
    size."""
    names = [f"x{i:02d}_entry" for i in range(40)]
    timings, base = _synthetic(names)
    timings[names[0]] = 10.0  # 10x the floor -> flagged
    out, _ = build_artifact(timings, dict(timings), {}, base, "sf", headline=names)
    line = json.dumps(out)
    assert out["flagged_over_2x"] == ["x00"]
    assert line.index('"flagged_over_2x"') > line.index('"ratios"')
    assert "x00" in line[-60:]


def test_tail_survives_a_flag_storm():
    """The round-10 truncation failure mode under ADVERSE conditions: at
    the current suite size with EVERY entry flagged, and at a 130-entry
    suite with a 20-entry flag storm, the tail must still carry every
    compact ratio, the summary stats, and the full flag list — the
    degradation order (ratios cut first, flags/stats never) is the
    design."""
    # current size, everything flagged: the flag list is capped at the
    # worst offenders (full set recoverable from the ratios map), the
    # true total rides flagged_count, and every ratio + the stats still
    # fit the tail
    from bench import _FLAG_CAP

    timings, base = _synthetic(HEADLINE)
    timings = {n: 3.0 for n in timings}  # all 3x -> all flagged
    out, _ = build_artifact(timings, dict(timings), {}, base, "sf")
    tail = _tail_keys(out)
    for n in HEADLINE:
        assert f'"{n.split("_", 1)[0]}"' in tail, n
    assert out["flagged_count"] == len(HEADLINE)
    assert len(out["flagged_over_2x"]) == min(_FLAG_CAP, len(HEADLINE))
    for key in ("ratio_mean", "ratio_worst", "flagged_count"):
        assert f'"{key}"' in tail

    # 130-entry budget with a 20-entry storm
    names = [f"x{i:03d}_synthetic_extension_entry" for i in range(130)]
    timings, base = _synthetic(names)
    for n in names[:20]:
        timings[n] = 5.0
    out, _ = build_artifact(timings, dict(timings), {}, base, "sf", headline=names)
    tail = _tail_keys(out)
    for n in names:
        assert f'"{n.split("_", 1)[0]}":' in tail, n
    assert '"ratio_mean"' in tail
    assert out["flagged_count"] == 20
    # capped list carries the worst offenders (all tied at 5x -> name order)
    assert out["flagged_over_2x"] == sorted(
        n.split("_", 1)[0] for n in names[:20]
    )[: len(out["flagged_over_2x"])]
