"""Self-bench artifact contract (VERDICT r7 #1)."""

from __future__ import annotations


def test_bench_self_artifact_schema():
    """BENCH_SELF_r08.json (VERDICT r7 #1): full per-query map at
    sf0.1 plus the sf1.0 iterative-tier run with scale ratios."""
    import json
    import os

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


def test_no_unexplained_per_query_regressions_vs_previous_round():
    """Round 10 (VERDICT r9 #9): the two newest committed BENCH_SELF
    artifacts are compared per-query; any query slower by more than
    REGRESSION_RATIO without an entry in the documented exemption
    list fails loudly. Sub-second queries are skipped (same-day run
    noise is 5-8% and fixed overhead dominates below ~0.5 s)."""
    import glob
    import json
    import os

    #: documented exemptions: query -> the diff-visible cause. Keep
    #: entries ONLY while the cause is visible in the round's diff.
    EXEMPTIONS: dict[str, str] = {
        # (none currently)
    }
    REGRESSION_RATIO = 1.5
    MIN_SEC = 0.5

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def medians_of(path):
        # medians-shaped artifacts only (r9+): a single-run baseline
        # (r8's shape) carries 5-8% same-day noise and is not an
        # apples-to-apples regression reference
        d = json.load(open(path))
        h = d.get("headline_sf0.1_medians")
        if h and "query_medians" in h:
            return h["query_medians"]
        return None

    arts = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_SELF_r*.json"))):
        m = medians_of(p)
        if m:
            arts.append((os.path.basename(p), m))
    if len(arts) < 2:
        import pytest

        pytest.skip("fewer than two comparable BENCH_SELF artifacts")
    (prev_name, prev), (cur_name, cur) = arts[-2], arts[-1]
    regressions = []
    for q in sorted(set(prev) & set(cur)):
        if q in EXEMPTIONS:
            continue
        p, c = float(prev[q]), float(cur[q])
        if p >= MIN_SEC and c > p * REGRESSION_RATIO:
            regressions.append(f"{q}: {p:.2f}s -> {c:.2f}s ({c / p:.2f}x)")
    assert not regressions, (
        f"per-query regressions {prev_name} -> {cur_name} above "
        f"{REGRESSION_RATIO}x with no documented exemption:\n  "
        + "\n  ".join(regressions)
    )
