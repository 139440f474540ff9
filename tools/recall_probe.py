"""Planted-pair recall under the banded-signature bucket caps at K×
corpus scale (VERDICT r9 #7): the §4 caps are recall-tested at 1× and
wall-time-probed at 8×/27×, but a cap that silently sheds recall as
buckets fill would look "fast" in those numbers. This probe plants
KNOWN near-duplicate pairs into the K×-upscaled sf0.1 document corpus
and measures the fraction recovered by the PRODUCTION-capped paths:

- ``dedup.minhash_lsh_pairs`` (16×4 banding, estimated-Jaccard verify,
  ``DEFAULT_MAX_BAND_BUCKET=500``): plants rewrites of ≥30-token docs
  with every 15th token replaced — each edit destroys the 3 shingles
  covering it, so the true 3-SHINGLE Jaccard is ≈ 12/18 ≈ 0.67
  against threshold 0.5 (banding recall at s=0.67 is
  1−(1−s⁴)¹⁶ ≈ 0.97; the probe measures what the cap takes off that).
- ``multimodal.phash_pairs`` at n_bits=256 with the registered
  ``max_band_bucket=64``: plants +1-byte-shift copies (hash-identical,
  Hamming 0 — pigeonhole guarantees all 8 bands collide, so any miss
  is the CAP's doing, which is exactly what we're measuring).
- ``similarity.banded_cosine_pairs`` (r12, the routed cosine scale
  path, forced banded + the router's one probe): plants ±≤3%
  component-scaled copies (cosine ≈ 0.999) into the K×-upscaled
  embeddings, threshold 0.95 — the high-cosine regime semantic dedup
  operates in.

Run: ``python tools/recall_probe.py [K] [n_planted]`` (default 27 /
200). Prints one JSON line:
{op: {"k": K, "n_planted": N, "n_recovered": M, "recall": r,
      "seconds": s}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from scaling_probe import BASE, upscale  # noqa: E402

from dfx_indicators_etl_spark.operators import dedup, multimodal, similarity  # noqa: E402
from dfx_indicators_etl_spark.session import get_spark  # noqa: E402

PLANT_OFFSET = 50_000_000_000  # above every replica-offset doc_id


def planted_corpus(spark, docs, n_planted: int, perturb: bool):
    """Pick ``n_planted`` docs deterministically and append a near-dup
    of each at doc_id + PLANT_OFFSET. ``perturb=True`` replaces every
    15th token (≈0.67 shingle-Jaccard rewrite — the module docstring's
    arithmetic — the minhash case);
    ``perturb=False`` shifts every char by +1 (hash-identical payload
    for the mean-threshold phash, Hamming 0)."""
    pool = docs
    if perturb:  # the Jaccard arithmetic above needs ≥30-token seeds
        pool = docs.filter(F.size(F.split(F.col("text"), " ")) >= 30)
    seeds = (
        pool.orderBy(F.pmod(F.xxhash64("doc_id"), F.lit(997)), "doc_id")
        .limit(n_planted)
        .localCheckpoint(eager=True)
    )
    if perturb:
        dup_text = F.array_join(
            F.zip_with(
                F.split(F.col("text"), " "),
                F.sequence(F.lit(0), F.size(F.split(F.col("text"), " ")) - 1),
                lambda tok, i: F.when(i % 15 == 0, F.lit("zq")).otherwise(tok),
            ),
            " ",
        )
    else:
        # +1 on every byte: aHash mean shifts equally -> identical bits
        dup_text = F.translate(
            F.col("text"),
            "abcdefghijklmnopqrstuvwxyz",
            "bcdefghijklmnopqrstuvwxyza",
        )
    dups = seeds.select(
        (F.col("doc_id") + F.lit(PLANT_OFFSET)).alias("doc_id"),
        dup_text.alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    planted_ids = [r["doc_id"] for r in seeds.select("doc_id").collect()]
    return docs.unionByName(dups.select(docs.columns)), planted_ids


def recall_of(pairs_df, planted_ids) -> tuple[int, int]:
    want = {(i, i + PLANT_OFFSET) for i in planted_ids}
    got = {
        (min(r[0], r[1]), max(r[0], r[1]))
        for r in pairs_df.select("doc_a", "doc_b").collect()
    }
    return len(want & got), len(want)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 27
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="recall_probe_")
    out = {}
    try:
        upscale(spark, "documents", k, tmp)
        docs = spark.read.parquet(f"{tmp}/documents.parquet").select(
            "doc_id", "text"
        )

        # --- minhash under DEFAULT_MAX_BAND_BUCKET ---
        corpus, ids = planted_corpus(spark, docs, n_planted, perturb=True)
        corpus = corpus.localCheckpoint(eager=True)
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(corpus, threshold=0.5)
        hit, tot = recall_of(pairs, ids)
        out["dedup_minhash"] = {
            "k": k,
            "cap": dedup.DEFAULT_MAX_BAND_BUCKET,
            "n_planted": tot,
            "n_recovered": hit,
            "recall": round(hit / tot, 4),
            "seconds": round(time.time() - t0, 1),
        }
        corpus.unpersist()

        # --- 256-bit phash under the registered cap (64) ---
        corpus, ids = planted_corpus(spark, docs, n_planted, perturb=False)
        payload = multimodal.attach_binary_payload(corpus).localCheckpoint(
            eager=True
        )
        t0 = time.time()
        pairs = multimodal.phash_pairs(
            payload, max_hamming=6, bands=8, n_bits=256, max_band_bucket=64
        )
        hit, tot = recall_of(pairs, ids)
        out["mm_phash_dedup_256"] = {
            "k": k,
            "cap": 64,
            "n_planted": tot,
            "n_recovered": hit,
            "recall": round(hit / tot, 4),
            "seconds": round(time.time() - t0, 1),
        }

        # --- 128-bit CAPPED phash (the r11 registered production
        # twin, mm_phash_dedup_capped: default 8×16-bit bands, cap 64)
        t0 = time.time()
        pairs = multimodal.phash_pairs(
            payload, max_hamming=6, max_band_bucket=64
        )
        hit, tot = recall_of(pairs, ids)
        out["mm_phash_dedup_capped"] = {
            "k": k,
            "cap": 64,
            "n_planted": tot,
            "n_recovered": hit,
            "recall": round(hit / tot, 4),
            "seconds": round(time.time() - t0, 1),
        }
        payload.unpersist()

        # --- banded cosine pairs (the r12 routed scale path, FORCED
        # banded with the router's default one probe): plant
        # perturbed copies (each component scaled by ±≤3% from a
        # deterministic per-component formula → cosine ≈ 0.999) into
        # the K×-upscaled embeddings and measure recovery at
        # threshold 0.95 — the high-cosine regime semantic dedup
        # actually operates in, as opposed to the §pair-crossover
        # boundary-recall worst case.
        upscale(spark, "embeddings", k, tmp)
        emb = spark.read.parquet(f"{tmp}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        seeds = (
            emb.orderBy(F.pmod(F.xxhash64("vec_id"), F.lit(997)), "vec_id")
            .limit(n_planted)
            .localCheckpoint(eager=True)
        )
        perturbed = seeds.select(
            (F.col("vec_id") + F.lit(PLANT_OFFSET)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x
                    * (
                        1.0
                        + (
                            F.pmod(F.col("vec_id") * 131 + j, F.lit(7))
                            - F.lit(3)
                        ).cast("double")
                        / 100.0
                    )
                ).cast("float"),
            ).alias("embedding"),
        )
        corpus = emb.unionByName(perturbed).localCheckpoint(eager=True)
        ids = [r["vec_id"] for r in seeds.select("vec_id").collect()]
        n_corpus = corpus.count()
        t0 = time.time()
        pairs = similarity.banded_cosine_pairs(
            corpus,
            threshold=0.95,
            n_rows=n_corpus,
            extra_probes=1,
        )
        want = {(i, i + PLANT_OFFSET) for i in ids}
        got = {
            (min(r[0], r[1]), max(r[0], r[1]))
            for r in pairs.select("id_a", "id_b").collect()
        }
        hit, tot = len(want & got), len(want)
        out["dedup_embedding_cosine_banded"] = {
            "k": k,
            "n_corpus": n_corpus,
            "extra_probes": 1,
            "n_planted": tot,
            "n_recovered": hit,
            "recall": round(hit / tot, 4),
            "seconds": round(time.time() - t0, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
