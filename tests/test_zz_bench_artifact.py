"""Self-bench artifact contract (VERDICT r7 #1; guard rewritten r11).

This file is deliberately named ``test_zz_*`` so it collects AFTER every
functional test: a measurement-methodology flag here must never abort
the functional suite under ``pytest -x`` (VERDICT r10 #1 — in round 10
the old guard killed the driver's run after 32 of ~934 tests).
"""

from __future__ import annotations

import glob
import json
import os
import statistics

#: a query must be at least this much slower RAW to even be considered
REGRESSION_RATIO = 1.5
#: ... AND this much slower after dividing out the suite-wide median
#: ratio (the measurement-window speed shift that bench.py's CPU
#: calibration does not capture — this host's run windows vary ±20%,
#: and slow windows inflate Python-worker/file-heavy entries up to
#: ~1.8x: r09->r10's worst window artifact normalized to 1.81x with no
#: code change, while a genuine 2x code regression in a neutral window
#: normalizes to ~2.0x)
NORMALIZED_RATIO = 1.9
MIN_SEC = 0.5

#: documented exemptions: query -> the diff-visible cause. Keep
#: entries ONLY while the cause is visible in the round's diff.
EXEMPTIONS: dict[str, str] = {
    # (none currently)
}


def pooled_times(headline_medians: dict) -> dict[str, float]:
    """Best available per-query time from one BENCH_SELF artifact.

    Prefer the MIN over the per-run maps (recorded since round 10):
    host-window degradation only ever inflates a query's time, so the
    min across runs is the most window-robust estimate of its true
    cost. Artifacts that predate per-run capture fall back to the
    committed cross-run medians.
    """
    per_run = [
        r["queries"] for r in headline_medians.get("per_run", [])
        if isinstance(r.get("queries"), dict)
    ]
    if per_run:
        names = set(per_run[0])
        for m in per_run[1:]:
            names &= set(m)
        return {q: min(float(m[q]) for m in per_run) for q in names}
    return {q: float(v) for q, v in headline_medians["query_medians"].items()}


def find_regressions(prev: dict[str, float], cur: dict[str, float],
                     exemptions: dict[str, str] | None = None) -> list[str]:
    """Window-normalized cross-round regression detection.

    The suite-wide MEDIAN ratio estimates the measurement-window speed
    shift between the two artifacts; each query's ratio is judged
    relative to it. A query is flagged only when it is slower by
    REGRESSION_RATIO raw AND NORMALIZED_RATIO after dividing out the
    median — so a uniformly slow window flags nothing, while a single
    genuinely regressed query stands out against its peers.
    """
    exemptions = exemptions or {}
    common = [
        q for q in sorted(set(prev) & set(cur))
        if q not in exemptions and float(prev[q]) >= MIN_SEC
    ]
    if len(common) < 10:
        return []
    ratios = {q: float(cur[q]) / float(prev[q]) for q in common}
    window = statistics.median(ratios.values())
    return [
        f"{q}: {prev[q]:.2f}s -> {cur[q]:.2f}s "
        f"({ratios[q]:.2f}x raw, {ratios[q] / window:.2f}x normalized)"
        for q in common
        if ratios[q] > REGRESSION_RATIO and ratios[q] / window > NORMALIZED_RATIO
    ]


def test_bench_self_artifact_schema():
    """BENCH_SELF_r08.json (VERDICT r7 #1): full per-query map at
    sf0.1 plus the sf1.0 iterative-tier run with scale ratios."""
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_SELF_r08.json")
    d = json.load(open(path))
    h = d["headline_sf0.1"]
    assert h["sf"] == 0.1 and h["n_queries"] == len(h["queries"]) >= 200
    assert all(isinstance(v, (int, float)) and v > 0 for v in h["queries"].values())
    assert "calibration_ratio" in h and "per_query_mean_normalized" in h
    it = d["iterative_sf1.0"]
    assert it["sf"] == 1.0
    for q in ("ml11_dbscan", "g7_cc_largestar", "g8_sssp", "g10_kcore",
              "l12_incremental_dedup", "l14_mmr_rerank", "e16_checkpoint_resume"):
        assert q in it["queries"] and q in it["scale_ratio_vs_sf0.1"]
    assert "ml11_dbscan_sf1.0" in d["notes"]


def test_guard_catches_injected_regression_and_ignores_slow_window():
    """The detector itself: a 2x single-query code regression in a
    neutral window is caught; a uniformly slow window (1.3x on all,
    1.8x on the Python-heavy tail) flags nothing."""
    prev = {f"q{i}": 1.0 + 0.01 * i for i in range(40)}
    # neutral window, one genuine 2x regression
    cur = {q: v * 1.05 for q, v in prev.items()}
    cur["q7"] = prev["q7"] * 2.0
    flagged = find_regressions(prev, cur)
    assert len(flagged) == 1 and flagged[0].startswith("q7:")
    # slow window: everything 1.3x, a Python-heavy tail at 1.8x, no code change
    cur = {q: v * 1.3 for q, v in prev.items()}
    for q in ("q1", "q2", "q3", "q4"):
        cur[q] = prev[q] * 1.8
    assert find_regressions(prev, cur) == []
    # exempted queries are skipped even at 3x
    cur = {q: v * 1.0 for q, v in prev.items()}
    cur["q5"] = prev["q5"] * 3.0
    assert find_regressions(prev, cur, {"q5": "documented cause"}) == []


def test_no_unexplained_per_query_regressions_vs_previous_round():
    """Round 10 (VERDICT r9 #9), rewritten round 11 (VERDICT r10 #1):
    the two newest committed BENCH_SELF artifacts are compared
    per-query on window-robust pooled times (min over per-run maps
    where recorded, medians otherwise), each ratio normalized by the
    suite-wide median ratio. Sub-second queries are skipped (fixed
    overhead dominates below ~0.5 s)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    arts = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_SELF_r*.json"))):
        d = json.load(open(p))
        h = d.get("headline_sf0.1_medians")
        if h and "query_medians" in h:
            arts.append((os.path.basename(p), pooled_times(h)))
    if len(arts) < 2:
        import pytest

        pytest.skip("fewer than two comparable BENCH_SELF artifacts")
    (prev_name, prev), (cur_name, cur) = arts[-2], arts[-1]
    regressions = find_regressions(prev, cur, EXEMPTIONS)
    assert not regressions, (
        f"per-query regressions {prev_name} -> {cur_name} above "
        f"{REGRESSION_RATIO}x raw and {NORMALIZED_RATIO}x window-normalized "
        "with no documented exemption:\n  " + "\n  ".join(regressions)
    )
