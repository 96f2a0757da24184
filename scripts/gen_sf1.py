#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) documents+embeddings corpus under
target/sf1 for the heavy-family scale probe (PLANS.md round 9).

Matches the sf0.1 schema and distribution: same 31-word vocabulary with
its empirical Zipf weights, geometric doc lengths (avg ~54 tokens),
5-lang / 20-source mix, planted exact (~0.16%) and near (last-token)
duplicates, 64-dim 10-label Gaussian-cluster embeddings. Seed 421.

Dev tooling only (like check_oracle.py) - not part of the library.
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

rng = np.random.default_rng(421)
vocab = duckdb.connect().execute("""
  SELECT tok, count(*) c FROM (
    SELECT unnest(string_split(text,' ')) AS tok
    FROM '/root/testdata/sf0.1/documents.parquet') GROUP BY 1
  ORDER BY c DESC""").df()
words = vocab['tok'].tolist()
w = vocab['c'].to_numpy().astype(float)
w /= w.sum()
N = 50000
langs = np.array(['en'] * 41 + ['de'] * 14 + ['es'] * 15 +
                 ['fr'] * 15 + ['zh'] * 15)
os.makedirs('target/sf1', exist_ok=True)
lens = np.clip(rng.geometric(1 / 45, N) + 9, 10, 400)
texts = []
for i in range(N):
    texts.append(' '.join(rng.choice(words, size=lens[i], p=w)))
for i in range(0, N, 625):
    if i + 1 < N:
        texts[i + 1] = texts[i]
for i in range(300, N, 1250):
    if i + 1 < N:
        t = texts[i].split()
        if len(t) > 3:
            t[-1] = 'CHANGED'
        texts[i + 1] = ' '.join(t)
tbl = pa.table({
    'doc_id': pa.array(range(N), pa.int64()),
    'text': pa.array(texts),
    'lang': pa.array(rng.choice(langs, N)),
    'source': pa.array([f'src{i % 20}' for i in rng.integers(0, 20, N)]),
    'n_chars': pa.array([len(t) for t in texts], pa.int64())})
pq.write_table(tbl, 'target/sf1/documents.parquet', row_group_size=5000)
M = 20000
centers = rng.normal(0, 1, (10, 64))
lab = rng.integers(0, 10, M)
emb = (centers[lab] + rng.normal(0, 0.6, (M, 64))).astype(np.float32)
et = pa.table({
    'vec_id': pa.array(range(M), pa.int64()),
    'embedding': pa.array([e for e in emb.tolist()], pa.list_(pa.float32())),
    'label': pa.array(lab, pa.int32())})
pq.write_table(et, 'target/sf1/embeddings.parquet', row_group_size=2500)
print('done', len(tbl), len(et))
