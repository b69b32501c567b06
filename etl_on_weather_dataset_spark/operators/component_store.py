"""Incremental connected-components maintenance through a persistent
store -- the day-2 shape of near-dup GROUP resolution.

``dedup_components`` resolves one batch's pair graph; a continuously
ingested corpus instead accumulates edges forever, and recomputing
components over every edge ever seen is O(history) per day. The
store makes each merge O(batch + affected):

- The store holds one row per node: ``(id, component, bucket)``,
  parquet-partitioned by ``bucket = crc32(component) % n_buckets``.
- Invariant (the whole trick): the stored labeling is a STAR-GRAPH
  spanning structure of the true component graph -- edges
  ``(id, component)`` reconnect exactly the components of every edge
  ever merged, so components(store-stars UNION new-edges) ==
  components(all edges ever). No raw edge is ever retained.
- A merge therefore: (1) finds the components TOUCHED by the new
  batch's endpoints, (2) pulls only their members, (3) runs the
  batch-grade label propagation on members' stars + new edges, and
  (4) rewrites only the parquet buckets those components (old and
  new labels) live in -- a STAGED write into an underscore-prefixed
  dir followed by a driver-side bucket-directory swap (see the
  in-code note on why dynamic partition overwrite cannot express
  "this bucket is now empty"); untouched buckets are never read or
  written. ``_BUCKETS`` trades rewrite granularity against file
  count -- size it so bucket ~ a rewrite unit your store's object
  sizes like (16 here; thousands at 100 TB).

  (Round-12 note: a supervertex-contracted propagation -- endpoints
  mapped to stored labels, diameter = merge-chain length -- was
  implemented, measured 30-50% slower at sf0.1 than the star-graph
  shape, and rejected; the merge is action-bound, not round-bound.
  Evidence table in SCALE.md's round-12 section.)

Labels are canonical (component = min reachable id), so the
incremental result is BIT-EQUAL to the one-shot recompute -- which is
exactly what the registered scenario attests against the DuckDB
recursive-CTE oracle over the union of all batches' edges.

Atomicity: the staged-write bucket swap is not transactional
across buckets. Production wraps each merge in the repo's versioned-store
commit protocol (operators/versioned.py -- write v+1, commit marker,
readers pin a version) exactly as the rollup store does; the merge
here is the data plane those versions snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import dedup_components

_BUCKETS = 16


def _bucket(component) -> F.Column:
    return F.crc32(F.col(component).cast("string")) % _BUCKETS


def read_component_store(
    spark: SparkSession, store_path: str
) -> DataFrame | None:
    """The store's (id, component) rows, or None before first merge."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(store_path).select("id", "component")
    except AnalysisException:
        return None


def merge_component_batch(
    spark: SparkSession,
    new_pairs: DataFrame,
    store_path: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Merge one batch of near-dup pairs into the component store and
    return the post-merge (id, component) rows of the AFFECTED
    subgraph (new nodes + every member of every touched component).

    Cost: O(batch + affected members), never O(store). The members
    pull is an equi-semi-join on component; the rewrite touches only
    the buckets hosting touched components' old or new labels.
    """
    pairs = new_pairs.select(
        F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b")
    )
    store = read_component_store(spark, store_path)
    if store is None:
        labels = dedup_components(pairs)
        out = labels.withColumn("bucket", _bucket("component"))
        # one task (= one file) per bucket: the bucket is the store's
        # unit of rewrite, so file count stays n_buckets regardless of
        # write parallelism upstream (64 x shuffle_partitions tiny
        # files measured 4x slower to write and reread)
        out.repartition("bucket").write.partitionBy("bucket").mode(
            "overwrite"
        ).parquet(store_path)
        return spark.read.parquet(store_path).select("id", "component")

    from .caching import persisted, untrack

    endpoints = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # persisted: referenced by the members pull, the affected-bucket
    # set, and the carried anti-join -- each evaluation would
    # otherwise re-scan the store
    touched = persisted(
        store.join(endpoints, "id", "left_semi")
        .select("component")
        .distinct()
    )
    members = store.join(touched, "component", "left_semi")
    # star edges reconnect each touched component exactly; adding the
    # batch pairs yields the merged truth on the affected subgraph.
    # The empty probe is skipped: an empty batch flows through to an
    # empty labeling and an empty bucket set (no rewrite), so the
    # extra scheduled action buys nothing on the every-day non-empty
    # path.
    graph = members.select(
        F.col("id").alias("id_a"), F.col("component").alias("id_b")
    ).unionAll(pairs)
    # check_every=4: a batch whose component-merge chains are d deep
    # converges in ~2d+1 member-graph rounds, so the daily d=1 shape
    # (3 rounds) lands exactly one convergence count at i=4 -- the
    # default's i=2 check always reads changed>0 for a merge batch
    # and is a pure extra action; deeper chains just ride more rounds
    # per check (the documented check_every trade).
    #
    # LAZY localCheckpoint (optimization round 13, guide par.5: the
    # merge was action-bound and the eager form scheduled one extra
    # job over already-cached rows): the returned labels still must
    # outlive the bucket swap below -- their lineage reads the store
    # files the swap deletes -- but the checkpoint need not be its
    # own job. Spark checkpoints a marked RDD when the FIRST job
    # computes it (SparkContext.runJob -> rdd.doCheckpoint), and the
    # affected-buckets collect below always computes labels (also on
    # the empty-batch path: that collect is how `bucks` comes back
    # empty), so the checkpoint is always materialized before any
    # file is deleted.
    labels = dedup_components(
        graph, skip_empty_check=True, check_every=4
    ).localCheckpoint(eager=False)

    new_rows = labels.withColumn("bucket", _bucket("component"))
    affected_buckets = (
        touched.select(_bucket("component").alias("bucket"))
        .unionAll(new_rows.select("bucket"))
        .distinct()
    )
    bucks = [b for (b,) in affected_buckets.collect()]
    if not bucks:
        touched.unpersist()
        untrack(touched)
        return labels
    # rows sharing an affected bucket but belonging to untouched
    # components must be carried over (the whole bucket directory is
    # replaced below)
    carried = (
        store.withColumn("bucket", _bucket("component"))
        .join(affected_buckets, "bucket", "left_semi")
        .join(touched, "component", "left_anti")
        .select("id", "component", "bucket")
    )
    # Replace affected buckets through a STAGED write: new rows +
    # carried rows land in an underscore-prefixed staging dir (parquet
    # discovery ignores _-prefixed paths), THEN the old bucket dirs
    # are swapped out driver-side (<= _BUCKETS deletes + renames, one
    # value per bucket, never data). The write job reads the store
    # while it is still intact, so carried needs NO checkpoint to
    # guard a read-own-rewrite race -- the previous delete+append
    # shape paid a full extra materialization for exactly that guard
    # (labels stays checkpointed: the RETURNED rows outlive the
    # swap). Dynamic partition overwrite still cannot express this
    # rewrite: a bucket whose every component was relabeled AWAY
    # contributes no output row, and its stale files would silently
    # survive (observed: a 2-batch chain merge kept both labelings).
    # On an object store where rename is copy, wrap merges in the
    # versioned-store commit protocol instead (module docstring).
    from .versioned import fs_for

    fs, _, jvm = fs_for(spark, store_path)
    stage = f"{store_path}/_staged_rewrite"
    (
        new_rows.select("id", "component", "bucket")
        .unionByName(carried)
        .repartition("bucket")  # one file per rewritten bucket
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(stage)
    )
    hpath = jvm.org.apache.hadoop.fs.Path
    for b in bucks:
        fs.delete(hpath(f"{store_path}/bucket={b}"), True)
        staged_bucket = hpath(f"{stage}/bucket={b}")
        if fs.exists(staged_bucket):
            # a staged bucket can be absent: emptied entirely
            fs.rename(staged_bucket, hpath(f"{store_path}/bucket={b}"))
    fs.delete(hpath(stage), True)
    touched.unpersist()
    untrack(touched)
    return labels


def component_store_summary(
    spark: SparkSession, store_path: str
) -> DataFrame:
    """One-row audit of the store: nodes, components, largest
    component, and exact integer checksums of the full labeling (sum
    of ids and of labels) -- a drift hash the one-shot recompute must
    reproduce bit-for-bit.

    One pass (optimization round 13, guide par.2.4/par.5): the
    previous shape scanned the store twice (a global aggregate
    crossJoined to a broadcast of the per-component aggregate -- scan
    + shuffle + broadcast-build jobs). All five outputs re-derive from
    the single per-component rollup: n_nodes = SUM(sz),
    sum_ids = SUM(per-component SUM(id)), sum_labels =
    SUM(component * sz) -- exact BIGINT arithmetic, so every value is
    bit-identical to the two-scan form."""
    store = spark.read.parquet(store_path)
    per = store.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.sum("id").cast("long").alias("sid"),
    )
    return per.agg(
        F.sum("sz").cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.max("sz").cast("long").alias("max_component"),
        F.sum("sid").cast("long").alias("sum_ids"),
        F.sum(F.col("component") * F.col("sz")).cast("long")
        .alias("sum_labels"),
    )
