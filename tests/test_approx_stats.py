"""Approx drop-ins behind the exact contracts (round-5, VERDICT r4
stretch item #8): ``match_stats(approx=True)`` must return the same
schema and agree with the exact path within the sketch's accuracy
bound on the fixtures, so the 100-TB story is executable, not
narrative."""

from __future__ import annotations

import pytest

from xf_spark.index.builder import build_engine
from xf_spark.index.segments import build_segment_index
from xf_spark.query.segment_search import SegmentIndex
from xf_spark.transcripts import load_transcripts


@pytest.fixture(scope="module")
def ix(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("approxidx"))
    eng = build_engine(load_transcripts(spark, 0.01))
    build_segment_index(
        eng.postings,
        n_docs=eng.stats.n_docs,
        avgdl=eng.stats.avgdl,
        path=path,
        prefix_postings=eng.prefix_postings,
        n_shards=4,
        n_buckets=16,
        slices=2,
    )
    return SegmentIndex.load(spark, path, docs=eng.docs)


def test_match_stats_approx_matches_exact(ix):
    exact = ix.match_stats("machine", percentiles=(0.5, 0.9, 0.99)).first()
    approx = ix.match_stats(
        "machine", percentiles=(0.5, 0.9, 0.99), approx=True
    ).first()
    # identical schema either way — the drop-in contract
    assert exact.asDict().keys() == approx.asDict().keys()
    # non-percentile aggregates are computed identically
    for k in ("n", "min", "max", "avg", "sum"):
        assert exact[k] == approx[k], k
    # Greenwald-Khanna with accuracy 10^4 on a fixture-sized match set
    # (<< 10^4 rows) must land on an actual member value within one
    # rank of the exact interpolated percentile; allow the
    # interpolation gap plus a tiny relative slack
    n = exact["n"]
    assert n > 50
    for k in ("p50", "p90", "p99"):
        lo = min(exact[k], approx[k])
        hi = max(exact[k], approx[k])
        assert hi - lo <= max(1.0, 0.02 * abs(exact[k])), (
            f"{k}: exact={exact[k]} approx={approx[k]}"
        )


def test_significant_terms_sampled_foreground(ix):
    """sample_fraction=1.0 must equal exact byte-for-byte; a sampled
    run (deterministic seed) must keep the schema and put the same
    term at rank 1 on the fixture (the head of the lift ranking is
    robust to 50% thinning at this corpus size)."""
    exact = ix.significant_terms("machine", limit=10).collect()
    full = ix.significant_terms(
        "machine", limit=10, sample_fraction=1.0
    ).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in full]

    sampled = ix.significant_terms(
        "machine", limit=10, sample_fraction=0.5
    ).collect()
    assert sampled, "sampled run returned nothing"
    assert sampled[0].asDict().keys() == exact[0].asDict().keys()
    assert sampled[0]["term"] == exact[0]["term"]
    # HT estimate: df column is exact (background untouched); n_match
    # is scaled back to match-set units, so it must be in the
    # ballpark of the exact count for the top term
    assert abs(sampled[0]["n_match"] - exact[0]["n_match"]) <= (
        0.5 * exact[0]["n_match"]
    )
    # two runs are deterministic (seeded sample)
    again = ix.significant_terms(
        "machine", limit=10, sample_fraction=0.5
    ).collect()
    assert [tuple(r) for r in sampled] == [tuple(r) for r in again]


def test_significant_terms_sample_fraction_validation(ix):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ix.significant_terms("machine", sample_fraction=0.0)
    with _pytest.raises(ValueError):
        ix.significant_terms("machine", sample_fraction=1.5)


def test_match_stats_approx_roles_filter(ix):
    """The approx path must flow through the same pre-aggregation
    filters as the exact one."""
    exact = ix.match_stats("machine", roles=["assistant"]).first()
    approx = ix.match_stats(
        "machine", roles=["assistant"], approx=True
    ).first()
    assert exact["n"] == approx["n"]
    assert exact["sum"] == approx["sum"]
