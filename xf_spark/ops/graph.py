"""Thread / reply-chain reconstruction — the recursive-CTE analog.

The reference reconstructs a tweet thread with one SQLite recursive
CTE (get_tweet_thread, storage.rs:1518-1562): walk ancestors up the
reply chain (depth < 100), pick the root (deepest ancestor whose
parent is absent), then expand all descendants of the root, returning
rows ordered by creation time.

Spark (< 4.x) has no recursive CTE, so the scalable re-expression is:

- **ancestor walk**: a driver loop of point lookups. Each step filters
  the table on ONE id — predicate pushdown makes it an index/point
  scan, and chains are short (bounded depth), so the driver loop costs
  O(depth) tiny jobs, never a shuffle.
- **descendant expansion**: a frontier loop — each iteration
  broadcast-semi-joins the (tiny) frontier id set against the edge
  table's parent column. The big table is scanned with a pushed-down
  `parent IN (frontier)` filter; nothing shuffles. Terminates at
  fixpoint or max_depth. This is the classic BFS-on-DataFrames shape
  that holds at 10^12 rows: per level, work is proportional to the
  thread (bounded), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_DEPTH = 100  # reference loop bound, storage.rs:1536


def ancestor_ids(
    edges: DataFrame,
    start_id: int,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = MAX_DEPTH,
) -> list[tuple[int, int | None, int]]:
    """Walk up the reply chain from ``start_id``; returns
    [(id, parent_id, depth)] with depth 0 at the start node."""
    out: list[tuple[int, int | None, int]] = []
    cur: int | None = start_id
    seen: set[int] = set()
    for depth in range(max_depth + 1):
        if cur is None or cur in seen:
            break
        row = (
            edges.where(F.col(id_col) == cur)
            .select(id_col, parent_col)
            .limit(1)
            .collect()
        )
        if not row:
            break
        seen.add(cur)
        parent = row[0][parent_col]
        out.append((cur, parent, depth))
        cur = parent
    return out


def thread_root(
    edges: DataFrame,
    start_id: int,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = MAX_DEPTH,
) -> int | None:
    """Root = deepest ancestor whose parent is NULL or absent from the
    table (storage.rs:1539-1545)."""
    anc = ancestor_ids(edges, start_id, id_col, parent_col, max_depth)
    if not anc:
        return None
    # the walk stops when parent is NULL or missing, so the last
    # visited ancestor IS the root unless its parent exists but was
    # beyond max_depth — mirror the reference's "parent NOT IN tweets"
    last_id, last_parent, _ = anc[-1]
    if last_parent is not None:
        present = edges.where(F.col(id_col) == last_parent).limit(1).count()
        if present:
            return last_parent  # depth-capped: reference picks it too
    return last_id


def descendant_ids(
    edges: DataFrame,
    root_id: int,
    id_col: str = "id",
    parent_col: str = "parent_id",
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """All ids reachable downward from ``root_id`` (inclusive) — a
    frontier loop of broadcast semi-joins (thread_ids CTE,
    storage.rs:1547-1553)."""
    spark = edges.sparkSession
    frontier = [root_id]
    all_ids: set[int] = {root_id}
    for _ in range(max_depth):
        if not frontier:
            break
        fdf = spark.createDataFrame([(i,) for i in frontier], f"{parent_col} long")
        nxt = (
            edges.join(F.broadcast(fdf), parent_col, "left_semi")
            .select(id_col)
            .collect()
        )
        frontier = [r[id_col] for r in nxt if r[id_col] not in all_ids]
        all_ids.update(frontier)
    return spark.createDataFrame([(i,) for i in sorted(all_ids)], f"{id_col} long")


def get_thread(
    docs: DataFrame,
    start_id: int,
    id_col: str = "id",
    parent_col: str = "parent_id",
    order_col: str | None = None,
    max_depth: int = MAX_DEPTH,
) -> DataFrame:
    """Full thread containing ``start_id``: ancestors -> root -> all
    descendants, ordered (get_tweet_thread, storage.rs:1518-1562).

    ``docs`` doubles as the edge table (id, parent_id columns)."""
    root = thread_root(docs, start_id, id_col, parent_col, max_depth)
    if root is None:
        return docs.where(F.lit(False))
    ids = descendant_ids(docs, root, id_col, parent_col, max_depth)
    out = docs.join(F.broadcast(ids), id_col, "left_semi")
    return out.orderBy(order_col if order_col else id_col)
