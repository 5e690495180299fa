"""Distributed decision-tree training (CART split search) over
integer text features (north-star extension; the reference has no
model training — its analytics stop at SQL aggregates).

The second classic trainable curation filter next to the linear probe
(operators/probe.py): threshold RULES over interpretable quality
features — the form quality filters actually ship in (Gopher's rules,
fastText's thresholds) — learned from data instead of hand-set. CART
split search (Breiman et al. 1984) is exactly aggregation-shaped, so
the distributed restatement is pure DataFrame algebra, and with
integer features + integer class counts the whole trainer is EXACT:

- candidate thresholds are the observed feature values; per
  (node, feature, value, class) counts cumulative-summed along the
  value order give every candidate's left/right class histogram in
  ONE window pass per level (no per-threshold rescan — the classic
  sorted-split-search trick, distributed);
- split quality is the weighted Gini purity Σ_side Σ_c n_sc²/n_s·n.
  Candidates are ranked by the exact integer pair (num, den) =
  (s_L·n_R + s_R·n_L, n_L·n_R) pushed through ONE correctly-rounded
  IEEE division — a/b on equal integers is bit-identical on every
  engine (unlike float accumulation, division is a single rounded
  op), so the ranking and the reported score are deterministic and
  the DuckDB oracle reproduces the TREE itself, not just summary
  stats. Ties break (feature asc, value asc).

Scale shape, per level: one groupBy over the train rows' exploded
(node, feature, value, class) keys (map-side combined), a window over
the per-node candidate grid (grid-sized, not corpus-sized), one
row_number per node, and a broadcast of the ≤2^depth split rows for
routing — the corpus-sized docs frame never shuffles except the
count aggregations keyed by (node, ...). Candidate cardinality is
bounded by the feature quantization (values are per-mille / ×100
integers), which is the production guard at 100 TB (histogram-binned
split search, the Chen & Guestrin approximate sketch): |grid| ≤
nodes·features·bins·classes regardless of corpus size. Int64 bounds:
counts ≤ N ⇒ num ≤ 2·|C|·N³ — safe under 2⁶³ to N ≈ 10⁶ rows per
node; beyond that, bin counts per node first (same plan, one more
keyed agg) — documented, not silently assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TREE_DEPTH = 2


def _best_splits(train_fv: DataFrame) -> DataFrame:
    """(node, split_feature, split_value, split_score) — the best
    (feature, threshold) per node by exact weighted Gini purity over
    ``train_fv`` = (node, label, f, v) train feature rows; nodes with
    no valid split (all rows identical on every feature) get no row."""
    cnt = train_fv.groupBy("node", "f", "v", "label").agg(
        F.count("*").alias("c")
    )
    classes = train_fv.select("label").distinct()
    grid = (
        cnt.select("node", "f", "v")
        .distinct()
        .join(F.broadcast(classes))
        .join(cnt, ["node", "f", "v", "label"], "left")
        .select(
            "node", "f", "v", "label", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    wcum = Window.partitionBy("node", "f", "label").orderBy("v")
    tot = cnt.groupBy("node", "f", "label").agg(F.sum("c").alias("tot"))
    j = (
        grid.withColumn("cum", F.sum("c").over(wcum))
        .join(tot, ["node", "f", "label"], "left")
        .select(
            "node",
            "f",
            "v",
            "cum",
            F.coalesce("tot", F.lit(0)).alias("tot"),
        )
    )
    agg = j.groupBy("node", "f", "v").agg(
        F.sum("cum").alias("n_l"),
        F.sum(F.col("cum") * F.col("cum")).alias("s_l"),
        F.sum(
            (F.col("tot") - F.col("cum")) * (F.col("tot") - F.col("cum"))
        ).alias("s_r"),
        F.sum("tot").alias("n"),
    )
    sc = agg.filter(F.col("n_l") < F.col("n")).select(
        "node",
        "f",
        "v",
        (
            (
                F.col("s_l") * (F.col("n") - F.col("n_l"))
                + F.col("s_r") * F.col("n_l")
            ).cast("double")
            / (F.col("n_l") * (F.col("n") - F.col("n_l"))).cast("double")
            / F.col("n").cast("double")
        ).alias("score"),
    )
    wb = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("f").asc(), F.col("v").asc()
    )
    return (
        sc.withColumn("_rk", F.row_number().over(wb))
        .filter(F.col("_rk") == 1)
        .select(
            "node",
            F.col("f").alias("split_feature"),
            F.col("v").alias("split_value"),
            F.col("score").alias("split_score"),
        )
    )


def _node_stats(docs: DataFrame, depth: int) -> DataFrame:
    """Per-node level stats: train class histogram → majority (ties
    to the smallest label), eval rows routed to the node, eval hits
    under the node's majority label."""
    cnt = docs.groupBy("node", "label").agg(
        F.sum(F.col("is_train").cast("long")).alias("tn"),
        F.sum((~F.col("is_train")).cast("long")).alias("en"),
    )
    wmaj = Window.partitionBy("node").orderBy(
        F.col("tn").desc(), F.col("label").asc()
    )
    maj = (
        cnt.withColumn("_rk", F.row_number().over(wmaj))
        .filter(F.col("_rk") == 1)
        .select(
            "node",
            F.col("label").alias("majority_label"),
            F.col("tn").alias("n_maj"),
            F.col("en").alias("eval_hits"),
        )
    )
    sums = cnt.groupBy("node").agg(
        F.sum("tn").alias("n_train"), F.sum("en").alias("n_eval")
    )
    return sums.join(maj, "node").select(
        F.lit(depth).cast("int").alias("depth"),
        F.col("node").alias("node_id"),
        "n_train",
        "n_eval",
        "majority_label",
        "n_maj",
        "eval_hits",
    )


def decision_tree_train(
    feats: DataFrame, depth: int = TREE_DEPTH
) -> DataFrame:
    """(depth, node_id, n_train, n_eval, majority_label, n_maj,
    eval_hits, split_feature, split_value, split_score) — the trained
    tree, one row per node per level. ``feats`` carries (doc_id,
    label, is_train, fmap: map<string, long>) — the integer feature
    map. Children of node k are 2k+1 (f ≤ threshold) and 2k+2; a node
    with no valid split persists unsplit into the next level (its
    split columns stay null). Level ``depth`` rows are the leaves."""
    docs = feats.select(
        "doc_id", "label", "is_train", "fmap", F.lit(0).cast("long").alias("node")
    ).localCheckpoint()
    levels = []
    for d in range(depth):
        train_fv = (
            docs.filter(F.col("is_train"))
            .select("node", "label", F.explode("fmap").alias("f", "v"))
        )
        best = F.broadcast(_best_splits(train_fv).localCheckpoint())
        levels.append(
            _node_stats(docs, d).join(
                best.withColumnsRenamed({"node": "node_id"}), "node_id", "left"
            )
        )
        docs = docs.join(best, "node", "left").select(
            "doc_id",
            "label",
            "is_train",
            "fmap",
            F.when(F.col("split_feature").isNull(), F.col("node"))
            .when(
                F.expr("try_element_at(fmap, split_feature)")
                <= F.col("split_value"),
                2 * F.col("node") + 1,
            )
            .otherwise(2 * F.col("node") + 2)
            .alias("node"),
        ).localCheckpoint()
    leaf = _node_stats(docs, depth).select(
        "*",
        F.lit(None).cast("string").alias("split_feature"),
        F.lit(None).cast("long").alias("split_value"),
        F.lit(None).cast("double").alias("split_score"),
    )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.unionByName(leaf)
