"""Deterministic 10x scale-up of the driver testdata for scale proof.

Reads ``/root/testdata/sf0.1`` and writes an sf1 directory (default
``/root/repo/.scale/sf1``) whose tables are 10x the rows.  The point of
this data is to measure *scaling*, so a naive "concat 10 copies" is
wrong: verbatim replication turns every document into a 10-way exact
duplicate and every embedding into a 10-way cosine-1 cluster, which
inflates near-dup pair counts quadratically and would make even a
perfectly linear operator look super-linear.  Real corpora grow by
adding *new mostly-dissimilar* content while the duplicate *rate* stays
roughly constant.  We model that with 10 shards:

- **documents** — each shard applies an injective per-shard token
  substitution (word ``w`` -> ``w + "x{shard}"`` for a hash-chosen ~35%
  of the vocabulary, applied uniformly across the shard).  A uniform
  injective token renaming preserves every within-shard Jaccard /
  shingle / minhash relationship exactly (the dup structure of sf0.1
  recurs per shard), while two shards' versions of the same text share
  only the unsubstituted tokens, putting cross-shard 3-gram Jaccard
  far below any dedup threshold.  Near-dup pairs therefore scale
  linearly: 10 shards -> 10x pairs in 10x buckets of unchanged size.
- **embeddings** — each shard applies a signed permutation of the 64
  dimensions (an orthogonal transform): within-shard inner products and
  norms are preserved bit-for-bit in structure (kmeans / IVF / SemDeDup
  see 10 independent copies of the sf0.1 geometry), cross-shard cosine
  is scrambled.
- **fact/dim tables** — key-offset sharding (keys += shard * max_key),
  which preserves all FK relationships within a shard; ``nation`` /
  ``region`` stay fixed (dims of fixed cardinality, as in TPC-H).

Everything is keyed off ``numpy.random.default_rng(seed)`` — two runs
produce byte-identical data.

Usage:  python tools/gen_scale.py [--src DIR] [--dst DIR] [--shards N]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SUBST_FRACTION = 0.35


def _subst_vocab(vocab: list[str], shard: int) -> dict[str, str]:
    """Hash-chosen ~35% of vocab gets a shard-unique injective rename.

    The rename must be injective against the FULL token space of the
    output shard — both the kept (unsubstituted) vocabulary and every
    other renamed token — or two previously-distinct tokens could merge
    and shift the duplicate rate the scale proof holds constant. The
    plain ``w + 'x{shard}'`` suffix can collide with a source word that
    already ends that way (e.g. vocab 'foox1' vs renamed 'foo' in
    shard 1), so each candidate is checked against the occupied set and
    re-suffixed until free. Deterministic: vocab is sorted, no RNG."""
    used = set(vocab)
    out = {}
    for w in vocab:
        h = hashlib.md5(f"{w}|{shard}".encode()).digest()[0] / 255.0
        if h < SUBST_FRACTION:
            nw = f"{w}x{shard}"
            while nw in used:
                nw += "x"
            used.add(nw)
            out[w] = nw
    return out


def scale_documents(src: str, dst: str, shards: int) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t.column("text").to_pylist()
    vocab = sorted({w for s in texts for w in s.split()})
    n = t.num_rows
    id_base = max(t.column("doc_id").to_pylist()) + 1
    parts = [t]
    for shard in range(1, shards):
        sub = _subst_vocab(vocab, shard)
        new_texts = [
            " ".join(sub.get(w, w) for w in s.split()) for s in texts
        ]
        parts.append(
            pa.table(
                {
                    "doc_id": pc.add(t.column("doc_id"), shard * id_base),
                    "text": pa.array(new_texts, type=pa.string()),
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": pa.array(
                        [len(s) for s in new_texts], type=pa.int64()
                    ),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "documents.parquet"))


def scale_embeddings(src: str, dst: str, shards: int, seed: int) -> None:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    id_base = max(t.column("vec_id").to_pylist()) + 1
    rng = np.random.default_rng(seed)
    parts = [t]
    for shard in range(1, shards):
        perm = rng.permutation(dim)
        signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
        rotated = vecs[:, perm] * signs  # signed permutation: orthogonal
        parts.append(
            pa.table(
                {
                    "vec_id": pc.add(t.column("vec_id"), shard * id_base),
                    "embedding": pa.array(
                        [row for row in rotated.tolist()],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": t.column("label"),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, "embeddings.parquet"))


def domain_base(src: str, table: str, col: str) -> int:
    """Offset base for a key domain, computed from the table that OWNS
    the domain (the PK side). Deriving a referencing table's FK base
    from its own column max would silently misalign shards whenever the
    PK domain's max value has no referencing row."""
    t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
    return max(t.column(col).to_pylist()) + 1


def scale_keyed(src: str, dst: str, name: str, key_bases: dict[str, int], shards: int) -> None:
    """Key-offset sharding: int key cols += shard * base, FKs preserved.
    ``key_bases`` maps each key column to its DOMAIN base (one base per
    key domain, from the PK table) so PK and FK columns of the same
    domain shift by identical offsets across tables."""
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    parts = [t]
    for shard in range(1, shards):
        cols = {}
        for field in t.schema:
            c = field.name
            if c in key_bases:
                cols[c] = pc.add(t.column(c), shard * key_bases[c]).cast(field.type)
            else:
                cols[c] = t.column(c)
        parts.append(pa.table(cols))
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"))


def copy_fixed(src: str, dst: str, name: str) -> None:
    pq.write_table(
        pq.read_table(os.path.join(src, f"{name}.parquet")),
        os.path.join(dst, f"{name}.parquet"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    ap.add_argument("--shards", type=int, default=10)
    ap.add_argument("--seed", type=int, default=20260813)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    scale_documents(args.src, args.dst, args.shards)
    scale_embeddings(args.src, args.dst, args.shards, args.seed)
    # Facts/dims: shard every key participating in an FK edge so joins
    # stay consistent within a shard. One base per key DOMAIN, computed
    # from the PK table, so o_custkey shifts by customer's base (not
    # orders' own max) and the FK edges survive any key distribution.
    # nation/region stay fixed-cardinality.
    custkey = domain_base(args.src, "customer", "c_custkey")
    suppkey = domain_base(args.src, "supplier", "s_suppkey")
    partkey = domain_base(args.src, "part", "p_partkey")
    orderkey = domain_base(args.src, "orders", "o_orderkey")
    event_id = domain_base(args.src, "events", "event_id")
    user_id = domain_base(args.src, "events", "user_id")
    scale_keyed(args.src, args.dst, "customer", {"c_custkey": custkey}, args.shards)
    scale_keyed(args.src, args.dst, "supplier", {"s_suppkey": suppkey}, args.shards)
    scale_keyed(args.src, args.dst, "part", {"p_partkey": partkey}, args.shards)
    scale_keyed(
        args.src, args.dst, "orders",
        {"o_orderkey": orderkey, "o_custkey": custkey}, args.shards,
    )
    scale_keyed(
        args.src, args.dst, "lineitem",
        {"l_orderkey": orderkey, "l_partkey": partkey, "l_suppkey": suppkey},
        args.shards,
    )
    scale_keyed(
        args.src, args.dst, "events",
        {"event_id": event_id, "user_id": user_id}, args.shards,
    )
    copy_fixed(args.src, args.dst, "nation")
    copy_fixed(args.src, args.dst, "region")

    for f in sorted(os.listdir(args.dst)):
        print(f, pq.read_metadata(os.path.join(args.dst, f)).num_rows)


if __name__ == "__main__":
    main()
