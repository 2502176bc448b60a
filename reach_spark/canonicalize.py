"""Entity canonicalization: connected components over alias/xref edges.

Reference analog: alias grounding share after coref — alias pairs form
components whose best grounding wins (coref/Coref.scala:381-446; SURVEY
§2.6 G7 maps it to GraphFrames-style CC / label propagation).

Spark shape: iterative min-label propagation on DataFrames. Each round is
one shuffle (groupBy node); lineage is cut with localCheckpoint so the plan
doesn't grow (SURVEY §4 note (2)). Convergence is bounded by the graph
diameter, which for alias graphs is tiny; a max-iteration cap guards
pathological inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def alias_edges(grounded_entities: DataFrame,
                links: DataFrame | None = None) -> DataFrame:
    """Edge list (src, dst) as strings. Sources of edges:
      - grounding xref: mention canonical-key node <-> ns:id node
      - coref links: mention's key node <-> antecedent's key node
    """
    key_node = F.concat(F.lit("key:"),
                        F.coalesce("canonical", F.lower("text")))
    id_node = F.concat(F.lit("id:"), "g_ns", F.lit(":"), "g_id")
    e1 = (grounded_entities
          .where(F.col("kind") == "tbm")
          .where(F.col("label") != "Site")
          .where(~F.col("label").startswith("Generic"))
          .where(F.col("g_ns").isNotNull())
          .select(key_node.alias("src"), id_node.alias("dst"))
          .distinct())
    # parenthetical alias relations ("Ras (H-Ras)") — G6 alias canonization
    alias_rel = (grounded_entities
                 .where(F.col("kind") == "relation")
                 .where(F.col("label") == "Alias")
                 .select(
                     # try_element_at: ANSI-safe under Catalyst filter
                     # reordering (predicates referencing these may run
                     # before the kind/label filters on arg-less rows)
                     F.concat(F.lit("key:"),
                              F.try_element_at("args",
                                               F.lit(1))["canonical"])
                     .alias("src"),
                     F.concat(F.lit("key:"),
                              F.try_element_at("args",
                                               F.lit(2))["canonical"])
                     .alias("dst"))
                 .where(F.col("src") != F.col("dst"))
                 .distinct())
    e1 = e1.unionByName(alias_rel)
    if links is None:
        return e1
    m = (grounded_entities
         .select("mention_id", key_node.alias("node")))
    e2 = (links
          .join(m, "mention_id")
          .withColumnRenamed("node", "src")
          .join(m.withColumnRenamed("mention_id", "antecedent_id")
                 .withColumnRenamed("node", "dst"), "antecedent_id")
          .select("src", "dst")
          .where(F.col("src") != F.col("dst"))
          .distinct())
    return e1.unionByName(e2)


def connected_components(edges: DataFrame, max_iter: int = 15,
                         probe_every: int = 2) -> DataFrame:
    """(src, dst) undirected → (node, component) with component = min node
    label in the component. Iterative label propagation; each iteration
    localCheckpoints to cut lineage.

    The convergence probe is a driver round-trip (`limit(1).count()`), so
    it runs only every `probe_every` iterations: one extra (cheap,
    already-converged) propagation beats a synchronous driver sync per
    step once the cluster is large. An iteration where no label changed
    is idempotent, so probing late never changes the result — only
    when it's detected. Alias graphs here are near-stars (diameter 2-3),
    so the loop typically runs 3-4 propagations and ~2 probes."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)
    for it in range(max_iter):
        # component candidates: own label + min neighbor label
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"])
            .select(sym["src"].alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        old = labels
        labels = new_labels
        if it % probe_every == probe_every - 1 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(old.alias("o"), "node")
                .where(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
    return labels


def canonical_entities(grounded_entities: DataFrame,
                       links: DataFrame | None = None) -> DataFrame:
    """Canonical entity table: (component, canonical_id, names, n_mentions).
    canonical_id = best grounding id in the component (non-uaz preferred,
    then lexicographic min — the 'best grounding per component' rule)."""
    edges = alias_edges(grounded_entities, links)
    cc = connected_components(edges)
    id_nodes = (
        cc.where(F.col("node").startswith("id:"))
        .withColumn("is_uaz", F.col("node").startswith("id:uaz"))
    )
    best = (
        id_nodes.groupBy("component")
        .agg(F.min(F.when(~F.col("is_uaz"), F.col("node"))).alias("best_id"),
             F.min("node").alias("any_id"))
        .select("component",
                F.expr("substring(coalesce(best_id, any_id), 4)")
                 .alias("canonical_id"))
    )
    names = (
        cc.where(F.col("node").startswith("key:"))
        .groupBy("component")
        .agg(F.array_sort(F.collect_set(F.expr("substring(node, 5)")))
             .alias("names"),
             F.count("*").alias("n_keys"))
    )
    return best.join(names, "component", "left")
