"""`ray job submit`-style CLI entrypoint for the north-rule core
pipelines: run one algorithm over an edge parquet, write the result as
resumable vid-partitioned parquet, print one JSON metrics line.

    python -m neo4j_graph_algorithms_ray pagerank \
        --edges /data/edges.parquet --src src --dst dst [--weight w] \
        --out /out/rank [--tolerance 1e-6 | --iterations 20] \
        [--checkpoint-dir /ckpt --resume]

On a cluster this module is the entrypoint passed to
``ray job submit -- python -m neo4j_graph_algorithms_ray ...``; the
job driver connects to the running cluster (``ray.init(address=
"auto")``) unless a local session already exists. The output layout
(`part=K.parquet` + `_SUCCESS`, via ``state.sinks``) skips finished
partitions on re-run, and ``--checkpoint-dir`` resumes iterative
kernels mid-run from per-iteration lineage checkpoints (north-rule
resumability). Reference surface: the ``CALL algo.<name>(...,
{write: true})`` procedures (``algo/.../PageRankProc.java`` ~L60,
``UnionFindProc.java`` ~L55, ``LabelPropagationProc.java`` ~L50,
``TriangleCountProc.java`` ~L45).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m neo4j_graph_algorithms_ray")
    p.add_argument(
        "pipeline",
        choices=[
            "pagerank", "wcc", "lpa", "triangle_count", "degree",
            "hits", "kcore",
            # corpus-curation pipelines (take --docs, emit parquet rows)
            "clean_corpus", "line_dedup", "dedup_keep_canonical",
            "pack_sequences", "weighted_sample", "pii_scrub",
        ],
    )
    p.add_argument("--edges", default=None, help="edge parquet path/dir (graph pipelines)")
    p.add_argument("--docs", default=None, help="documents parquet path/dir (curation pipelines)")
    p.add_argument("--src", default="src")
    p.add_argument("--dst", default="dst")
    p.add_argument("--weight", default=None)
    p.add_argument("--out", required=True, help="output parquet directory")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--tolerance", type=float, default=1e-6)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--directed", action="store_true")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():  # under `ray job submit` the job
        # driver attaches to the running cluster; standalone runs get a
        # local session
        ray.init(
            address="auto" if args.num_cpus is None else "local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    import ray.data as rd

    _DOC_PIPELINES = {
        "clean_corpus", "line_dedup", "dedup_keep_canonical",
        "pack_sequences", "weighted_sample", "pii_scrub",
    }
    if args.pipeline in _DOC_PIPELINES:
        if not args.docs:
            print("--docs is required for curation pipelines", file=sys.stderr)
            return 2
        t0 = time.perf_counter()
        docs = rd.read_parquet(args.docs)
        if args.pipeline == "clean_corpus":
            from .pipelines.text_analysis import clean_corpus

            res = clean_corpus(docs)
        elif args.pipeline == "line_dedup":
            from .pipelines.text_analysis import line_dedup

            res = line_dedup(docs)
        elif args.pipeline == "dedup_keep_canonical":
            from .pipelines.dedup import dedup_keep_canonical

            res = dedup_keep_canonical(docs)
        elif args.pipeline == "pack_sequences":
            from .pipelines.packing import pack_sequences

            res = pack_sequences(docs)
        elif args.pipeline == "weighted_sample":
            from .pipelines.sampling import weighted_sample

            res = weighted_sample(docs)
        else:
            from .pipelines.text_analysis import pii_scrub

            res = pii_scrub(docs)
        res.write_parquet(args.out)
        t_all = time.perf_counter() - t0
        rows = rd.read_parquet(args.out).count()  # parquet-metadata count
        print(
            json.dumps(
                {
                    "pipeline": args.pipeline,
                    "rows": rows,
                    "total_sec": round(t_all, 3),
                    "out": args.out,
                }
            )
        )
        return 0

    if not args.edges:
        print("--edges is required for graph pipelines", file=sys.stderr)
        return 2

    from .state.checkpoint import CheckpointConfig
    from .state.graph import GraphTables
    from .state.sinks import write_node_properties

    t0 = time.perf_counter()
    ds = rd.read_parquet(
        args.edges,
        columns=[c for c in (args.src, args.dst, args.weight) if c],
    )
    graph = GraphTables.from_dataset(
        ds, src=args.src, dst=args.dst, weight=args.weight
    )
    t_project = time.perf_counter() - t0

    ckpt = (
        CheckpointConfig(dir=args.checkpoint_dir, resume=args.resume)
        if args.checkpoint_dir
        else None
    )

    t0 = time.perf_counter()
    metrics: dict = {}
    if args.pipeline == "pagerank":
        from .pipelines.pagerank import PageRankConfig, pagerank

        res = pagerank(
            graph,
            PageRankConfig(
                damping=args.damping,
                tolerance=args.tolerance,
                fixed_iterations=args.iterations,
                weighted=args.weight is not None,
                checkpoint=ckpt,
            ),
        )
        vectors = {"rank": res.ranks}
        metrics = {"iterations": res.iterations, "converged": res.converged}
    elif args.pipeline == "wcc":
        from .pipelines.components import wcc

        res = wcc(graph, threshold=args.threshold, checkpoint=ckpt)
        vectors = {"component": res.components}
        metrics = {"set_count": res.set_count, "rounds": res.rounds}
    elif args.pipeline == "lpa":
        from .pipelines.labelprop import LabelPropagationConfig, label_propagation

        res = label_propagation(
            graph,
            LabelPropagationConfig(
                fixed_iterations=args.iterations,
                weighted=args.weight is not None,
                directed=args.directed,
                checkpoint=ckpt,
            ),
        )
        vectors = {"label": res.labels}
        metrics = {"iterations": res.iterations}
    elif args.pipeline == "hits":
        from .pipelines.pagerank import hits

        res = hits(
            graph,
            tolerance=args.tolerance,
            fixed_iterations=args.iterations,
        )
        vectors = {"hub": res.hubs, "auth": res.auths}
        metrics = {"iterations": res.iterations, "converged": res.converged}
    elif args.pipeline == "kcore":
        from .pipelines.kcore import kcore

        # contract check (kcore.py module docstring): the kernel treats
        # the edge list as UNDIRECTED and expects at most ONE
        # orientation per pair — a graph holding both u->v and v->u
        # double-counts neighbors and inflates coreness. Arbitrary
        # user parquet can violate this, so sample and warn.
        sample = graph.edges.limit(100_000).to_pandas()
        if len(sample):
            import numpy as _np

            s = sample["si"].to_numpy()
            d = sample["di"].to_numpy()
            key = _np.minimum(s, d) * _np.int64(graph.n) + _np.maximum(s, d)
            orient = s < d
            both = len(_np.intersect1d(key[orient], key[~orient]))
            if both:
                print(
                    f"WARNING: kcore input holds BOTH orientations of "
                    f"{both} sampled pair(s); the kernel counts each "
                    "orientation as a separate neighbor, inflating "
                    "coreness. Canonicalize to one row per undirected "
                    "pair (e.g. keep src<dst) before running.",
                    file=sys.stderr,
                )
        res = kcore(graph, fixed_rounds=args.iterations, checkpoint=ckpt)
        vectors = {"coreness": res.coreness.astype("float64")}
        metrics = {
            "rounds": res.iterations,
            "converged": res.converged,
            "max_coreness": int(res.coreness.max()) if graph.n else 0,
            "frontier_sizes": res.metrics["frontier_sizes"],
        }
    elif args.pipeline == "triangle_count":
        from .pipelines.triangles import triangle_count

        res = triangle_count(graph)
        vectors = {"triangles": res.triangles, "coefficient": res.coefficients}
        metrics = {
            "triangle_count": res.triangle_count,
            "average_coefficient": res.average_coefficient,
        }
    else:  # degree
        vectors = {
            "out_degree": graph.out_degree().astype("int64"),
            "in_degree": graph.in_degree().astype("int64"),
        }
    t_compute = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink = write_node_properties(graph, vectors, args.out)
    t_write = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "pipeline": args.pipeline,
                "vertices": graph.n,
                "edges": graph.m,
                "project_sec": round(t_project, 3),
                "compute_sec": round(t_compute, 3),
                "write_sec": round(t_write, 3),
                **metrics,
                **{f"sink_{k}": v for k, v in sink.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
