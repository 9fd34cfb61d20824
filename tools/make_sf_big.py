"""Deterministic sfN upscaler for scale-stress benchmarking.

The driver's testdata stops at sf0.1; the 100-TB design point needs
evidence that the heavy operators grow ~linearly past it (cardinality
guards actually flipping to their distributed tiers, no driver-memory
spikes). This tool replicates /root/testdata/sf0.1 K× with shifted keys
(foreign-key relationships preserved: replica r offsets every key space
by r·|keyspace|), writing to a scratch dir. Texts get per-replica vocabulary renaming so
near-dup survivor sets keep the same per-replica structure without
collapsing across replicas; embeddings get small deterministic additive
Gaussian perturbation for the same reason. NOTE: the perturbation moves
pairwise cosines, so the dedup_embedding ORACLE's exactness margin
(no pair within 1e-4 of the 0.98 threshold) is only verified on the
driver corpora — sf_big outputs are for throughput/memory stress, not
oracle comparison.

Usage: python tools/make_sf_big.py [K] [out_dir]
Defaults: K=10 (→ "sf1"), out_dir=/tmp/testdata_sf1.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# per-table key columns to shift, with their sf0.1 keyspace size
SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
SMALL = ["region", "nation"]  # dimension tables: copied once, not scaled


def upscale(k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in SMALL:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out_dir}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        base = pq.read_table(f"{SRC}/{t}.parquet")
        reps = []
        for r in range(k):
            tab = base
            for col, space in shifts.items():
                idx = tab.schema.get_field_index(col)
                typ = tab.schema.field(col).type
                shifted = pc.add(tab[col], pa.scalar(r * space, typ))
                tab = tab.set_column(idx, col, shifted.cast(typ))
            if t == "documents" and r > 0:
                # per-replica VOCABULARY RENAMING: suffix every word
                # with the replica tag. Inside a replica the text keeps
                # its exact structure (word order, df distribution,
                # dup/near-dup clusters — all identical to sf0.1), while
                # across replicas every shingle differs, so true
                # near-dup pair counts grow LINEARLY with K. (A plain
                # text suffix left replicas near-identical — quadratic
                # true-pair inflation; word-shuffling collapsed the
                # shingle vocabulary to every 3-gram of the small word
                # pool, destroying prefix-filter selectivity. Both made
                # stress reads superlinear for data reasons.)
                idx = tab.schema.get_field_index("text")
                tag = f"{r}r"
                out_t = [
                    " ".join(w + tag for w in (txt or "").split(" "))
                    for txt in tab["text"].to_pylist()
                ]
                tab = tab.set_column(idx, "text",
                                     pa.array(out_t, pa.string()))
            if t == "embeddings" and r > 0:
                vecs = np.stack([np.asarray(v, np.float32)
                                 for v in tab["embedding"].to_pylist()])
                rng = np.random.default_rng(1000 + r)
                vecs = vecs + rng.normal(0, 0.05, vecs.shape) \
                    .astype(np.float32)
                idx = tab.schema.get_field_index("embedding")
                tab = tab.set_column(
                    idx, "embedding",
                    pa.array([v.tolist() for v in vecs],
                             pa.list_(pa.float32())))
            reps.append(tab)
        out = pa.concat_tables(reps)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
        print(t, out.num_rows, flush=True)


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
    upscale(k, out)
