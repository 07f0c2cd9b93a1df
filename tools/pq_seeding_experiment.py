"""PQ codebook seeding experiment (VERDICT r11 Next #5 / Missing #4).

Hypothesis under test: k-means++-class seeding (hash-seeded D^2
sampling, maximin/farthest-first, or sequential Efraimidis-Spirakis
D^2 picks) would improve PQ codebook quality over the shipped init
(the n_codes lowest-id subvectors ~= a plain deterministic sample)
while staying deterministic/oracle-replayable.

Result (this box, 2026-08, /root/testdata sf0.001/0.01/0.1, m=4,
n_codes=16, 1 Lloyd iter, recall@10 of the top-40 ADC shortlist vs
exact cosine, mean over the first 8 query vectors):

    sf       lowest-id   d2-oneshot   maximin   kmeans++-seq
    0.001      0.65/0.72    0.46        0.64       0.38
    0.01       0.71/0.72    0.52        0.56       0.66
    0.1        0.55/0.50    0.32        0.42       0.30

Every "improved" seeding is WORSE on this geometry. The synthetic
embeddings are near-uniform on the 64-d sphere; D^2-class seedings
bias seeds toward outliers, which are good centers for clustered data
and bad ones for uniform data — a plain sample IS the right init
here. Extra Lloyd iterations (2/3/5/8) reduce distortion
monotonically (-6% at 8 iters) but leave shortlist recall flat: with
16 codes per 16-dim subspace on uniform data, ADC resolution — not
codebook placement — is the recall ceiling, so `rerank` width remains
the recall knob (as tests/test_pq.py pins).

Decision: keep the lowest-id init (bit-exact oracle replay, no
quality loss measured). Re-run this script if the embedding
distribution ever becomes clustered (real text/image embeddings
usually are) — on clustered data the ranking typically reverses and
`pq_train` should then grow a `seed="d2"` mode.

Run: python tools/pq_seeding_experiment.py [sf ...]
"""
from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

M, N_CODES, ITERS, K, RERANK, N_QUERIES = 4, 16, 1, 10, 40, 8


def _uhash(i: int) -> float:
    h = hashlib.md5(str(int(i)).encode()).hexdigest()
    return (int(h[:15], 16) + 1) / float(1 << 60)


def _lloyd(X, books, dsub):
    for _ in range(ITERS):
        new = []
        for s in range(M):
            Xs = X[:, s * dsub:(s + 1) * dsub]
            C = books[s]
            a = np.argmin((C * C).sum(1)[None, :] - 2 * Xs @ C.T, axis=1)
            B = C.copy()
            for ci in range(N_CODES):
                msk = a == ci
                if msk.sum():
                    B[ci] = Xs[msk].mean(0)
            new.append(B)
        books = new
    return books


def _recall(X, ids, books, dsub, qi):
    n = len(X)
    codes = []
    for s in range(M):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = books[s]
        codes.append(np.argmin((C * C).sum(1)[None, :] - 2 * Xs @ C.T, 1))
    codes = np.stack(codes, 1)
    q = X[qi]
    norms = np.linalg.norm(X, axis=1)
    qn = np.linalg.norm(q)
    adc = np.zeros(n)
    for s in range(M):
        lut = books[s] @ q[s * dsub:(s + 1) * dsub]
        adc += lut[codes[:, s]]
    ac = adc / (norms * qn)
    short = sorted(range(n), key=lambda i: (-ac[i], ids[i]))[:RERANK]
    cos = X @ q / (norms * qn)
    exact = sorted(range(n), key=lambda i: (-cos[i], ids[i]))[:K]
    got = sorted(short, key=lambda i: (-cos[i], ids[i]))[:K]
    return len(set(exact) & set(got)) / K


def seedings(X, ids, dsub):
    n = len(X)
    out = {"lowest-id": [
        X[:N_CODES, s * dsub:(s + 1) * dsub].copy() for s in range(M)
    ]}
    b = []
    for s in range(M):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        c0 = Xs[0]
        d2 = ((Xs - c0) ** 2).sum(1)
        key = np.array([
            np.log(_uhash(ids[i])) / d2[i] if d2[i] > 0 else -np.inf
            for i in range(n)
        ])
        picks = sorted(range(n), key=lambda i: (-key[i], ids[i]))[:N_CODES - 1]
        b.append(np.vstack([c0, Xs[picks]]))
    out["d2-oneshot"] = b
    b = []
    for s in range(M):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        chosen = [0]
        mind = ((Xs - Xs[0]) ** 2).sum(1)
        for _ in range(N_CODES - 1):
            cand = max(range(n), key=lambda i: (mind[i], -ids[i]))
            chosen.append(cand)
            mind = np.minimum(mind, ((Xs - Xs[cand]) ** 2).sum(1))
        b.append(Xs[chosen].copy())
    out["maximin"] = b
    b = []
    for s in range(M):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        chosen = [0]
        mind = ((Xs - Xs[0]) ** 2).sum(1)
        for step in range(N_CODES - 1):
            keys = np.array([
                np.log(_uhash(ids[i] * 1000 + step)) / mind[i]
                if mind[i] > 0 else -np.inf
                for i in range(n)
            ])
            cand = max(range(n), key=lambda i: (keys[i], -ids[i]))
            chosen.append(cand)
            mind = np.minimum(mind, ((Xs - Xs[cand]) ** 2).sum(1))
        b.append(Xs[chosen].copy())
    out["kmeans++-seq"] = b
    return out


def main():
    sfs = sys.argv[1:] or ["0.001", "0.01", "0.1"]
    for sf in sfs:
        d = duckdb.sql(
            f"SELECT vec_id, embedding FROM read_parquet("
            f"'/root/testdata/sf{sf}/embeddings.parquet') ORDER BY vec_id"
        ).fetchnumpy()
        ids = d["vec_id"]
        X = np.vstack([np.array(v, dtype=np.float64) for v in d["embedding"]])
        dsub = X.shape[1] // M
        for name, init in seedings(X, ids, dsub).items():
            books = _lloyd(X, init, dsub)
            rs = [_recall(X, ids, books, dsub, q) for q in range(N_QUERIES)]
            print(
                f"sf{sf} n={len(X)} {name:13s} "
                f"recall@{K}={np.mean(rs):.3f} per-q="
                + ",".join(f"{r:.1f}" for r in rs)
            )


if __name__ == "__main__":
    main()
