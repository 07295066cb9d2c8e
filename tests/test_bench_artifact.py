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
