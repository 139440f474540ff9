"""kNN-graph multi-probe recall/cost curve at the LOW-cosine boundary
(VERDICT r12 #6 / r13 queue #2+#4): `knn_graph_banded`'s per-edge
recall is the banded-pair curve at that edge's cosine, and on a
random corpus a top-k neighbor sits near cosine ~0.4 — the LSH worst
case where banded recall floors at 0.57–0.75 (SCALE.md
§pair-crossover). The router already carries one probe by default;
this probe measures WHAT that buys on the kNN face, against the
alternative of raising L (num_tables), on the same corpus:

- exact ground truth: `knn_graph_exact` (mutual=False, directed
  top-k edges)
- candidates: `knn_graph_banded` at L=24 with extra_probes 0/1/2,
  and L=48 with 0 probes (the linear-cost alternative)
- recall = |banded ∩ exact| / |exact| on (src, dst) edge sets;
  cost = wall seconds (bucket state scales (1+probes)·L/24)

Run: ``python tools/knn_multiprobe_probe.py [n] [k]`` (default 20000
5). Prints one JSON line:
{variant: {"recall": r, "seconds": s, "edges": m}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pair_crossover_probe import synth  # noqa: E402

from dfx_indicators_etl_spark.operators import similarity as S  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402


def edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("knn-multiprobe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = synth(spark, n)

    t0 = time.time()
    exact = edge_set(S.knn_graph_exact(df, k=k, mutual=False))
    exact_s = round(time.time() - t0, 2)
    out = {"exact": {"recall": 1.0, "seconds": exact_s, "edges": len(exact)}}

    variants = [
        ("banded_L24_p0", dict(num_tables=24, extra_probes=0)),
        ("banded_L24_p1", dict(num_tables=24, extra_probes=1)),
        ("banded_L24_p2", dict(num_tables=24, extra_probes=2)),
        ("banded_L48_p0", dict(num_tables=48, extra_probes=0)),
    ]
    for name, kw in variants:
        t0 = time.time()
        got = edge_set(
            S.knn_graph_banded(df, k=k, mutual=False, n_rows=n, **kw)
        )
        secs = round(time.time() - t0, 2)
        out[name] = {
            "recall": round(len(got & exact) / max(len(exact), 1), 4),
            "seconds": secs,
            "edges": len(got),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
