"""neo4j_graph_algorithms_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the public
``mknblch/neo4j-graph-algorithms`` library (PageRank, connected
components, label propagation, triangle counting, shortest paths,
centralities) as idiomatic Ray Data pipelines:

- graphs are plain ``ray.data.Dataset`` edge tables (``src``, ``dst``,
  optional ``weight``), densified to int ids and materialized once
  (the analog of the reference's ``GraphLoader`` projection —
  ``core/GraphLoader.java`` in the reference tree);
- per-vertex state (ranks, labels, colors) lives in dense numpy vectors
  broadcast zero-copy through the Ray object store (the analog of the
  reference's flat ``double[]``/``int[]`` arrays);
- iterative kernels are driver-side loops where each round is a
  ``map_batches`` gather-scatter over zero-copy Arrow edge blocks with
  map-side pre-aggregation, combined either on the driver (streamed
  partials) or via ``groupby().aggregate`` shuffles.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — the
driver (or ``bench.py`` / the CLI / the pytest session fixture) owns the
Ray session.
"""

__version__ = "0.1.0"


def configure_ray_data() -> None:
    """Engine-wide Ray Data context defaults.

    HASH_SHUFFLE is required for key-based ``repartition`` (edge
    co-occurrence grouping) and is the right strategy for this engine's
    shuffles generally (hash-partitioned groupbys, no global order
    needed). The strategy is captured by Datasets at creation time, so
    it must be set before any Dataset in a pipeline is built — hence at
    package import. Sorts are unaffected.

    The aggregator reservation cap MUST live here too, for the same
    capture-at-creation reason (verified on Ray 2.49.2: a Dataset
    snapshots DataContext when created, and its repartition reads the
    snapshot — mutating the global later is a no-op for that plan).
    Ray's default reserves 1/16 CPU per partition for hash-shuffle
    aggregators, so one max-width exchange (8 partitions/CPU, the
    state.partitioning cap) reserves HALF the cluster, and a plan with
    several concurrent keyed exchanges (minhash-LSH unions run three)
    reserves MORE than the cluster — upstream maps then starve behind
    the aggregator actors and the plan crawls near-deadlocked
    (observed: 10M-doc dedup_keep_canonical, 35.6 of 32 CPUs reserved,
    ~0 blocks/min). 1/64 CPU per partition keeps a max-width exchange
    at ~12% of the cluster; aggregators are append/concat-bound and
    timeshare fine. An explicit user setting is respected (we only
    fill Ray's None default).
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override is None:
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 1.0 / 64


configure_ray_data()
