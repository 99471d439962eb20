"""Physical-plan regression pins: the scale story is only real if the
optimizer actually gets to apply it. These tests assert the plan
SHAPE — predicate pushdown reaching the parquet scans, partition
pruning, column pruning, broadcast joins for k-row hydration, and
TakeOrderedAndProject for top-k — so a refactor that silently breaks
one of them fails loudly instead of just running 100x slower at SF1k.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from xf_spark.index.builder import build_engine
from xf_spark.transcripts import load_transcripts


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def seg_ix(spark, tmp_path_factory):
    """UNCACHED persisted segment index (cache would hide the parquet
    scan behind InMemoryTableScan and defeat the pushdown assertions)."""
    from xf_spark.index.segments import build_index
    from xf_spark.query.segment_search import SegmentIndex

    path = str(tmp_path_factory.mktemp("segix"))
    tr = load_transcripts(spark, 0.001)
    docs, _stats, _metrics = build_index(tr, path, slices=1)
    return SegmentIndex.load(spark, path, docs=docs)


class TestSegmentScanPushdown:
    """search() itself resolves shard top-ks driver-side (the result
    plan is a LocalTableScan by design — small-k merges cost ~250ms as
    Spark jobs); the property to pin is that the SEGMENT SCAN it runs
    gets full pushdown, asserted on the same where() the engine
    builds (segment_search.py query path)."""

    def _scan(self, seg_ix, term: str):
        from xf_spark.index.segments import term_bucket

        return seg_ix._segments.where(
            (F.col("field") == "text")
            & F.col("bucket").isin([term_bucket(term, 64)])
            & (F.col("term") == term)
        )

    def test_term_and_bucket_filters_reach_parquet(self, seg_ix):
        plan = plan_of(self._scan(seg_ix, "machine"))
        assert "PushedFilters" in plan
        assert "EqualTo(term,machine)" in plan
        assert "EqualTo(bucket" in plan

    def test_field_partition_pruned(self, seg_ix):
        plan = plan_of(self._scan(seg_ix, "machine"))
        # field is a directory partition: pruned, never row-filtered
        assert "PartitionFilters" in plan
        assert "(field" in plan and "= text)" in plan

    def test_filtered_search_driver_resolved(self, seg_ix):
        # role/ts-filtered search on the driver fast path: the filter
        # resolves candidate-bounded BEFORE top-k and the final page is
        # a local relation — zero serve-time shuffles or joins
        hits = seg_ix.search("machine", limit=10, since="2023-01-01 00:00:00")
        plan = plan_of(hits)
        assert "LocalTableScan" in plan
        assert "SortMergeJoin" not in plan
        assert "Exchange" not in plan

    def test_filtered_search_distributed_cogroup_shape(self, seg_ix):
        # distributed filtered path: segments COGROUPed with the
        # shard-aligned doc attrs (filter evaluated inside the shard,
        # k rows out per shard), then a k-sized TakeOrdered merge —
        # never a post-hoc semi-join over full match sets
        old = seg_ix.driver_topk_threshold
        seg_ix.driver_topk_threshold = 0
        try:
            hits = seg_ix.search(
                "machine", limit=10, since="2023-01-01 00:00:00"
            )
            plan = plan_of(hits)
        finally:
            seg_ix.driver_topk_threshold = old
        assert "FlatMapCoGroupsInPandas" in plan
        assert "TakeOrderedAndProject" in plan
        assert "SortMergeJoin" not in plan


class TestDocScanShape:
    def test_ts_filter_pushed_to_docs_scan(self, spark, tmp_path):
        # at-rest docs (uncached parquet): ts range filters must reach
        # the scan — this is the 100 TB partition-pruning path
        p = str(tmp_path / "docs_at_rest")
        load_transcripts(spark, 0.001).write.parquet(p)
        at_rest = spark.read.parquet(p).where(
            F.col("ts") >= F.lit("2023-01-01 00:00:00").cast("timestamp")
        )
        plan = plan_of(at_rest)
        assert "GreaterThanOrEqual(ts" in plan

    def test_column_pruning_two_col_projection(self, spark):
        tr = load_transcripts(spark, 0.001)
        two = tr.select("conv_id", "turn_idx")
        plan = plan_of(two)
        # ReadSchema must NOT include the wide text column
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
        assert read_schema and "text" not in read_schema[0]


class TestJoinAndTopK:
    def test_hydration_is_broadcast(self, spark):
        eng = build_engine(load_transcripts(spark, 0.001), with_prefix=False)
        plan = plan_of(eng.search_hydrated("machine", limit=5))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan  # k-row side must never sort-merge

    def test_topk_is_take_ordered(self, spark):
        eng = build_engine(load_transcripts(spark, 0.001), with_prefix=False)
        plan = plan_of(eng.search("machine", limit=5), "simple")
        assert "TakeOrderedAndProject" in plan


class TestVocabArtifactPlans:
    """Round-5 pins: the sorted vocabulary artifact must stay the
    background model of significant_terms (not a per-call segments
    re-aggregate), and prefix predicates against it must reach the
    parquet scan (the term-sorted row-group pruning the artifact
    exists for)."""

    def test_prefix_range_pushed_to_artifact_scan(self, seg_ix):
        vocab = seg_ix._vocab_df()
        plan = plan_of(vocab.where(F.col("term").startswith("ma")))
        assert "PushedFilters" in plan
        assert "StringStartsWith(term,ma)" in plan

    def test_significant_terms_reads_artifact_not_segments_agg(self, seg_ix):
        # the vocab artifact files live under <index>/vocab; the
        # segments table under <index>/segments. The bg side of the
        # plan must scan vocab, and the ONLY segments scan allowed is
        # the foreground match evaluation (no groupBy over segments
        # feeding the term join).
        df = seg_ix.significant_terms("machine", limit=5)
        plan = plan_of(df)
        assert "/vocab" in plan, "background model no longer reads the artifact"
        # the artifact read carries the (term, df) aggregate already
        # materialized — a regression to the per-call aggregate shows
        # up as a sum(n_docs) hash aggregate in the plan (the
        # foreground match evaluation may scan segments, but never
        # aggregates n_docs)
        assert "sum(n_docs)" not in plan
