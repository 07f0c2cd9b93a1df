"""Synthesize larger scale factors from /root/testdata/sf0.1 by
id-offset union — the second (and third) measured decade of scale
evidence (VERDICT r5 "What's missing" #2). Output goes under
REPO/.scaledata/sf{N}/ (gitignored); /root/testdata is never written.

Naive replication would be WRONG for this engine's workloads: copying
`documents.text` verbatim gives every doc 9+ exact clones, so dedup /
LSH / shared-span queries would measure an artificial quadratic pair
explosion instead of natural scaling. Replicas are therefore
decorrelated with structure-preserving transforms:

- documents: per-replica vocabulary remap (every token gets a replica
  suffix). Within a replica all docs are transformed identically, so
  intra-replica shingle/token similarity structure — dup clusters,
  shared spans, BM25 stats shape — is preserved exactly; across
  replicas the vocabularies are disjoint, so no synthetic near-dups.
- embeddings: circular shift of the vector by `replica` positions —
  an orthogonal permutation, so norms and ALL intra-replica cosine
  geometry are bit-preserved while cross-replica alignment is
  scrambled.
- events: event_id/user_id offset; ts untouched → per-user temporal
  density (sessionization, as-of, gap stats) is invariant, the user
  population grows 10x.
- lineitem/orders/customer: consistent key offsets (o_orderkey ==
  l_orderkey joins still match; customer FK chain preserved).
  Dimension tables (region/nation/part/supplier) are copied unscaled —
  dims grow slower than facts, and the broadcast-join plans under test
  assume exactly that.

Usage: python tools/make_scale.py [mult] (default 10 -> sf1)
"""
from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from qcache_spark.session import get_spark, load_table

SRC = "/root/testdata/sf0.1"

# Offsets chosen as round numbers safely above the sf0.1 max ids.
OFF = {
    "doc_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "vec_id": 1_000_000,
    "o_orderkey": 10_000_000,
    "c_custkey": 1_000_000,
}


def replicate(df, i: int, id_offsets: dict[str, int]):
    out = df
    for col, off in id_offsets.items():
        if col in df.columns:
            out = out.withColumn(col, F.col(col) + F.lit(i * off))
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = 0.1 * mult
    sf_name = f"sf{sf:g}"
    dest = os.path.join(REPO, ".scaledata", sf_name)
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest)
    spark = get_spark(app_name="make-scale")

    # documents: replica-suffixed vocabulary (replica 0 untouched).
    # The suffix is LETTERS ONLY, attached directly to every
    # letter/digit run: under BOTH tokenizers in the engine
    # (dedup.tokenize whitespace split AND text.word_tokens
    # [^\p{L}\p{N}]+ split) 'wordxc' is one token distinct from
    # 'word', so cross-replica vocabularies are genuinely disjoint.
    # (The previous '·<i>' suffix was itself a word_tokens SEPARATOR:
    # it left base vocabularies identical across replicas and added a
    # digit token per word — the sweep then measured that distorted
    # corpus for every word_tokens-based query.)
    def replica_suffix(i: int) -> str:
        s = ""
        while True:
            s = chr(ord("a") + i % 26) + s
            i //= 26
            if i == 0:
                return "x" + s

    docs = load_table(spark, SRC, "documents")
    parts = [docs]
    for i in range(1, mult):
        r = replicate(docs, i, OFF).withColumn(
            "text",
            F.regexp_replace("text", r"([\p{L}\p{N}]+)", rf"$1{replica_suffix(i)}"),
        )
        r = r.withColumn("n_chars", F.length("text"))
        parts.append(r)
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dest, "documents.parquet")
    )

    # embeddings: circular shift by replica; once the shift wraps
    # (i >= dim) a bare shift would REPEAT replica i-dim's vectors
    # exactly (replica 64 == replica 0 at dim=64 — mass fake
    # duplicates), so wrapped replicas are additionally negated.
    # Two full wraps would repeat again; refuse past that.
    emb = load_table(spark, SRC, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    if mult > 2 * dim:
        raise SystemExit(
            f"mult={mult} exceeds the decorrelation capacity of "
            f"shift+negate over dim={dim} vectors (max {2 * dim})"
        )
    parts = [emb]
    for i in range(1, mult):
        k = i % dim
        shifted = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        )
        if i >= dim:
            shifted = F.transform(shifted, lambda x: -x)
        parts.append(replicate(emb, i, OFF).withColumn("embedding", shifted))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(8).write.mode("overwrite").parquet(
        os.path.join(dest, "embeddings.parquet")
    )

    # events / lineitem / orders / customer: pure key offsets
    for name in ["events", "lineitem", "orders", "customer"]:
        df = load_table(spark, SRC, name)
        offs = dict(OFF)
        if name == "lineitem":
            offs["l_orderkey"] = OFF["o_orderkey"]
        if name == "orders":
            offs["o_custkey"] = OFF["c_custkey"]
        parts = [replicate(df, i, offs) for i in range(mult)]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        union.repartition(16 if name in ("lineitem", "events") else 8).write.mode(
            "overwrite"
        ).parquet(os.path.join(dest, f"{name}.parquet"))

    # dims: copy unscaled
    for name in ["region", "nation", "part", "supplier"]:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(dest, f"{name}.parquet")
        )
    print(f"wrote {dest} (mult={mult}, {sf_name})")


if __name__ == "__main__":
    main()
